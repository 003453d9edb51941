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

import numpy as np
import pandas as pd
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


def fused_ingest_expr(hex_resolutions=(5, 6, 7, 8, 9), s2_level: int = 12,
                      zooms=(5, 9, 12), municipalities=None,
                      include_geometry: bool = True):
    """The whole per-row derivation (WKB point, hex cells, S2, tiles,
    partition prefix, PIP municipality attribution) as ONE pandas UDF —
    a single Arrow round trip per batch instead of three.

    At bandwidth-bound parallelism every extra eval node re-materializes the
    full row stream; fusing the derivations nearly halves memory traffic and
    is what makes 8->32-thread scaling efficient (see BENCH.md).
    Returns a Column of struct; use :func:`ingest_fused` to flatten.
    """
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from ..kernels import cells as C
    from ..kernels import geom as G
    from ..kernels import wkb as W

    muni = municipalities if municipalities is not None else fixtures.municipalities_pdf()
    polys = [(row["id"], (row["name"], row["ely_area"], row["elinvoimakeskus"]),
              (row["minx"], row["miny"], row["maxx"], row["maxy"]),
              W.loads(bytes(row["wkb"])))
             for _, row in muni.iterrows()]
    index = G.PolygonGridIndex(polys)
    ids_arr = np.array([p[0] for p in polys] + [None], dtype=object)
    name_arr = np.array([p[1][0] for p in polys] + [None], dtype=object)
    ely_arr = np.array([p[1][1] for p in polys] + [None], dtype=object)
    evk_arr = np.array([p[1][2] for p in polys] + [None], dtype=object)
    res_list = tuple(hex_resolutions)
    zs = tuple(zooms)

    fields = ([T.StructField("geometry", T.BinaryType())] if include_geometry else [])
    fields += [T.StructField("geom_kind", T.StringType())]
    fields += [T.StructField(f"cell_r{r}", T.LongType()) for r in res_list]
    fields += [T.StructField(f"s2_l{s2_level}", T.LongType()),
               T.StructField("cell_prefix", T.LongType())]
    for z in zs:
        fields += [T.StructField(f"tile_x_z{z}", T.LongType()),
                   T.StructField(f"tile_y_z{z}", T.LongType())]
    fields += [T.StructField("municipality_id", T.StringType()),
               T.StructField("Kunta", T.StringType()),
               T.StructField("Vastuualue", T.StringType()),
               T.StructField("Elinvoimakeskus", T.StringType())]
    struct_t = T.StructType(fields)

    @pandas_udf(struct_t)
    def fused(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        lo = lon.to_numpy(np.float64)
        la = lat.to_numpy(np.float64)
        n = len(lo)
        data: dict = {}
        if include_geometry:
            head = bytes([1, 1, 0, 0, 0])
            xs = lo.astype("<f8").tobytes()
            ys = la.astype("<f8").tobytes()
            data["geometry"] = [head + xs[i * 8:(i + 1) * 8] + ys[i * 8:(i + 1) * 8]
                                for i in range(n)]
        data["geom_kind"] = np.full(n, "point", dtype=object)
        for r in res_list:
            data[f"cell_r{r}"] = C.hex_cell(lo, la, r)
        data[f"s2_l{s2_level}"] = C.s2_cell(lo, la, s2_level)
        data["cell_prefix"] = C.hex_cell(lo, la, spatial.PARTITION_RES)
        for z in zs:
            tx, ty = C.mercator_tile(lo, la, z)
            data[f"tile_x_z{z}"] = tx
            data[f"tile_y_z{z}"] = ty
        midx = index.assign(lo, la)
        data["municipality_id"] = ids_arr[midx]
        data["Kunta"] = name_arr[midx]
        data["Vastuualue"] = ely_arr[midx]
        data["Elinvoimakeskus"] = evk_arr[midx]
        return pd.DataFrame(data)

    return fused, struct_t


def ingest_fused(images: DataFrame, hex_resolutions=(5, 6, 7, 8, 9),
                 s2_level: int = 12, zooms=(5, 9, 12),
                 include_geometry: bool = True) -> DataFrame:
    """prepare_images + attribute_municipality in one UDF eval pass."""
    fused, struct_t = fused_ingest_expr(hex_resolutions, s2_level, zooms,
                                        include_geometry=include_geometry)
    df = images.withColumn("_d", fused(F.col("lon"), F.col("lat")))
    return df.select("*", *[F.col(f"_d.{f.name}").alias(f.name)
                            for f in struct_t.fields]).drop("_d")


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


def compact_cells(df: DataFrame, base_res: int = 5, fine_res: int = 7,
                  sparse_threshold: int = 100) -> DataFrame:
    """Inverse of :func:`adaptive_cells` — the H3-``compact`` storage
    layout: rows keyed at the FINE resolution whose parent cell's total
    count falls BELOW the threshold are merged up to the parent, so a
    sparse wilderness is one directory instead of thousands of near-empty
    fine cells (file-count pressure is the real cost at 10^12 rows), while
    dense city cells keep fine granularity.  Output ``cell_compact`` +
    ``cell_res`` per row.

    Same scale shape as the split: one map-side-combinable parent count
    agg, a broadcast of the SPARSE parent set, and a per-row when()."""
    base = f"cell_r{base_res}"
    fine = f"cell_r{fine_res}"
    counts = df.groupBy(base).count()
    sparse = (counts.filter(F.col("count") < sparse_threshold)
                    .select(base).withColumn("_sparse", F.lit(True)))
    out = df.join(F.broadcast(sparse), base, "left")
    return (out.withColumn("cell_compact",
                           F.when(F.col("_sparse"), F.col(base))
                            .otherwise(F.col(fine)))
               .withColumn("cell_res",
                           F.when(F.col("_sparse"), F.lit(base_res))
                            .otherwise(F.lit(fine_res)))
               .drop("_sparse"))


def ingest(images: DataFrame, root: str, job_id: str) -> dict:
    """Full checkpoint-resumable ingest: prepare -> attribute -> write."""
    from ..sources import table as store

    def _write():
        prepared = attribute_municipality(prepare_images(images))
        return store.write_partitioned(prepared, root, job_id)

    doc = store.run_step(root, job_id, "ingest-write", _write)
    return doc or {"skipped": True, "job_id": job_id}
