"""Physical-plan helpers: partitioning, skew, salted aggregation."""
