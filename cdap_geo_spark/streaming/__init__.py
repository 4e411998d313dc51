"""Streaming operators (Structured Streaming + batch-equivalent)."""
