"""Structured Streaming jobs (SURVEY §2.10 — additive capability)."""
