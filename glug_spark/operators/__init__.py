"""Engine operators beyond the core index/query path: path filters,
dedup, similarity search, text analysis, multimodal plumbing."""
