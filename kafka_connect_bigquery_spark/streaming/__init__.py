"""Structured Streaming pipeline wiring (the sink task equivalent)."""
