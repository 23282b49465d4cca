"""Structured Streaming: continuous block ingest + watermarked analytics."""
