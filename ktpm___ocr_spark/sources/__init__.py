"""Sources: scans, schema enforcement, and distributed synthesis."""
