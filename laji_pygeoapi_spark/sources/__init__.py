"""Sources & sinks: deterministic fixture generators, the partitioned
occurrence/image store (Iceberg-style layout on parquet + JSON manifests),
and lineage/checkpoint bookkeeping."""
