"""Query serving: OGC API Features semantics over the occurrence table."""
