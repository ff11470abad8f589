"""Dataflow operators (SURVEY.md §2) re-expressed as Spark plans."""
