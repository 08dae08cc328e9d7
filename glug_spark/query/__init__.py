"""Query layer: parsing, BM25 scoring, top-k, phrase, WAND."""
