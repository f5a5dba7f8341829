"""Structured Streaming surface: incremental diff and windowed aggregation."""
