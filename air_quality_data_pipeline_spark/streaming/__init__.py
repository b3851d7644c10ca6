"""Structured Streaming jobs and batch time-windowing."""
