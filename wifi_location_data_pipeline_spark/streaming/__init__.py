"""Structured Streaming variants of the ingest/transform path (SURVEY.md §2.8)."""
