"""Structured Streaming front-end for the ingest pipeline."""
