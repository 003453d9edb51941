"""The flagship ingest pipeline (north rule): image+caption rows ->
synthesized occurrence points -> cell encoding -> PIP attribution ->
partitioned store, checkpoint-resumable.

This is the job the bench measures at two parallelism levels.  Plan shape:

    scan(images) -> project(point wkb, geom_kind)        [no shuffle]
      -> cell-encode pandas UDF (hex r5-9 + S2 + prefix) [no shuffle]
      -> broadcast PIP join (municipality attribution)   [no shuffle]
      -> repartition(cell_prefix, geom_kind) -> write    [ONE shuffle]

The single shuffle is the partitioned-write clustering; everything upstream
is map-side.  Skew: the Helsinki hotspot concentrates rows in a few
cell_prefix values — ``salt_dense_cells`` splits writer partitions for cells
above a density threshold (adaptive cell splitting to finer resolutions is
the query-side counterpart, see adaptive_cells).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import spatial
from ..sources import fixtures


def prepare_images(images: DataFrame, hex_resolutions=(5, 6, 7, 8, 9),
                   s2_level: int = 12, zooms=(5, 9, 12)) -> DataFrame:
    """Shared batch/stream ingest projection: geometry + cells + kind."""
    from ..functions.geometry import point_wkb
    df = images.withColumn("geometry", point_wkb(F.col("lon"), F.col("lat")))
    df = df.withColumn("geom_kind", F.lit("point"))
    df = spatial.with_cells(df, hex_resolutions=hex_resolutions,
                            s2_level=s2_level, zooms=zooms)
    return df


def attribute_municipality(df: DataFrame) -> DataFrame:
    """Broadcast PIP join against the municipality polygons -> Kunta,
    Vastuualue (ELY), replacing the reference's upstream-interpreted fields
    (J4; reference delegates to warehouse + PostGIS GIST)."""
    muni = fixtures.municipalities_pdf()
    out = spatial.pip_join(df, muni, extra_cols=("name", "ely_area", "elinvoimakeskus"))
    return (out.withColumnRenamed("poly_name", "Kunta")
               .withColumnRenamed("poly_ely_area", "Vastuualue")
               .withColumnRenamed("poly_elinvoimakeskus", "Elinvoimakeskus")
               .withColumnRenamed("poly_id", "municipality_id"))


def salt_dense_cells(df: DataFrame, max_rows_per_task: int = 500_000,
                     counts: DataFrame | None = None) -> DataFrame:
    """Write-side skew control: compute per-cell_prefix counts (cheap agg on
    the already-encoded column), then add a deterministic ``_salt`` that
    splits any cell above the threshold into ceil(n/max) sub-writers.

    Equivalent rows, more parallel files for hot cells — the AQE-independent
    guarantee that no single writer task receives a Helsinki-sized cell.
    """
    counts = counts or df.groupBy("cell_prefix").count()
    buckets = counts.select(
        "cell_prefix",
        F.greatest(F.lit(1), F.ceil(F.col("count") / max_rows_per_task)).alias("_nbuckets"))
    out = df.join(F.broadcast(buckets), "cell_prefix", "left")
    return out.withColumn(
        "_salt",
        (F.pmod(F.xxhash64("image_id"), F.coalesce(F.col("_nbuckets"), F.lit(1)))).cast("int")
    ).drop("_nbuckets")


def adaptive_cells(df: DataFrame, base_res: int = 5, fine_res: int = 7,
                   dense_threshold: int = 10_000) -> DataFrame:
    """Query-side adaptive cell split (north rule): cells whose row count
    exceeds the threshold are re-keyed at a finer hex resolution, so
    per-cell aggregates stay bounded.  Output column ``cell_adaptive`` plus
    ``cell_res`` records which resolution each row landed on."""
    base = f"cell_r{base_res}"
    fine = f"cell_r{fine_res}"
    counts = df.groupBy(base).count()
    dense = counts.filter(F.col("count") > dense_threshold).select(base).withColumn("_dense", F.lit(True))
    out = df.join(F.broadcast(dense), base, "left")
    return (out.withColumn("cell_adaptive",
                           F.when(F.col("_dense"), F.col(fine)).otherwise(F.col(base)))
               .withColumn("cell_res",
                           F.when(F.col("_dense"), F.lit(fine_res)).otherwise(F.lit(base_res)))
               .drop("_dense"))


def ingest(images: DataFrame, root: str, job_id: str) -> dict:
    """Full checkpoint-resumable ingest: prepare -> attribute -> write."""
    from ..sources import table as store

    def _write():
        prepared = attribute_municipality(prepare_images(images))
        return store.write_partitioned(prepared, root, job_id)

    doc = store.run_step(root, job_id, "ingest-write", _write)
    return doc or {"skipped": True, "job_id": job_id}
