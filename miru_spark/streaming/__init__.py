"""Structured Streaming layer: live ingest (sip), windowed analytics."""
