"""Structured Streaming: incremental index ingestion."""
