"""Structured Streaming jobs (SURVEY §2.8 T1–T6)."""
