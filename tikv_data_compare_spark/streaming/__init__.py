"""Structured Streaming surface: incremental diff, windowed aggregation,
stateful sessionization, and continuous checksum-manifest maintenance."""
