"""Structured Streaming ingestion (SURVEY.md §2.1, §2.10, §3.1)."""
