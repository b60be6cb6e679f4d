"""Sources & sinks: the ingest layer (SURVEY §2.1 S1-S16)."""
