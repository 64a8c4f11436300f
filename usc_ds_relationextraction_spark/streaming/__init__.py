"""Structured Streaming ingestion (optional path — SURVEY.md §2.9:
the parity contract is batch; this exposes the same extraction logic
over readStream for incremental corpora)."""
