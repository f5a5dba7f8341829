"""Scalar/aggregate function helpers: cross-engine SQL generation and hashes."""
