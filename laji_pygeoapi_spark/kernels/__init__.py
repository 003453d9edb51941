"""Pure-numpy computational kernels (no Spark imports).

The container ships no shapely / h3 / PIL / pyproj, so the geometry, cell-index,
CRS and codec primitives the engine needs are implemented here from public
specifications.  Everything is written to be called on *batches* (numpy arrays
or lists) from Arrow-vectorized pandas UDFs — never per-row from Spark.
"""
