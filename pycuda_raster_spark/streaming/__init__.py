"""Lineage manifest, resumable execution, and the Structured Streaming
incremental runner (SURVEY.md §2.8)."""
