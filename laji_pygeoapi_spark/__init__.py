"""laji_pygeoapi_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the query/data-processing capabilities of the reference
``luomus/laji-pygeoapi`` (a pandas/geopandas ETL + PostGIS-backed OGC API
Features server) as an idiomatic Spark engine:

* one logical occurrence/image table partitioned by ``(geom_kind, cell_prefix)``
  replaces the reference's 66 PostGIS tables (reference
  ``pygeoapi/scripts/main.py:85``, ``edit_db.py:262-296``);
* the transform chain, dedup, group-merge and metadata SQL of
  ``pygeoapi/scripts/{process_data,compute_variables,edit_db}.py`` become lazy
  DataFrame plans optimized by Catalyst;
* spatial machinery (H3-style + S2 cell encoding, broadcast point-in-polygon,
  kNN via k-ring + haversine re-rank, raster tiling) is built on pure-numpy
  kernels invoked from Arrow-batched pandas UDFs (no per-row Python).

This container ships no shapely/h3/PIL/pyproj, so ``kernels/`` implements the
needed computational geometry, cell indexes, CRS math and codecs from public
specifications (WKB spec, S2 geometry spec, slippy-map tiles, Karney's
transverse-Mercator series, the PNG RFC 2083).
"""

__version__ = "0.1.0"
