"""Structured Streaming forms of the reference's incremental cadence."""
