"""Dataflow operators of the ingest engine (SURVEY.md §2 D-operators)."""
