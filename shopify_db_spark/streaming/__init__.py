"""Structured Streaming surface: incremental ingest (the streaming
analogue of the reference's created_at_min/max request windows) and
event-time windowed/sessionized aggregations."""
