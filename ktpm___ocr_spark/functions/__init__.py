"""Scalar/array function families (SURVEY.md §2.2, §2.3, §2.8)."""
