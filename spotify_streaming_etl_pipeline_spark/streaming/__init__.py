"""Structured Streaming front end (SURVEY §2.9)."""
