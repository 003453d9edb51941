"""Driver-level planning helpers: ingest pipeline, cell-range predicates,
skew handling (SURVEY §4 'custom physical machinery')."""
