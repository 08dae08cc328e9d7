"""Inverted-index build: tokenize → postings → stats → encoded lists."""
