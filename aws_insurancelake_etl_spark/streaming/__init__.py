"""Structured Streaming ingestion."""

from .ingest import micro_batch_ingest, windowed_event_counts  # noqa: F401
