"""Incremental ingest (Structured Streaming + watermark batch)."""
