"""Raster tile materialization (north rule M4).

Every image+caption row is assigned a WebMercator ``(zoom, x, y)`` tile from
its occurrence point; all rows of one tile are assembled into a single
encoded raster mosaic by ``applyInPandas`` (grouped-map: one group = one
tile).  The per-row invariant is checked end-to-end: pixels decoded from the
source blob must survive placement into the tile and extraction back out at
PSNR >= 40 dB with caption equality (lossless for PNG, >=46 dB for the lossy
stand-in codec).

Scale notes: the groupBy shuffles each row once keyed by tile; dense tiles
(Helsinki) are bounded by ``max_per_tile`` deterministic sampling, the same
strategy real map renderers use; tile assembly is numpy blitting, Arrow in
and out.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels import cells as C
from ..kernels import codec

TILE_SIZE = 256

TILE_SCHEMA = T.StructType([
    T.StructField("zoom", T.IntegerType()),
    T.StructField("x", T.LongType()),
    T.StructField("y", T.LongType()),
    T.StructField("n_images", T.IntegerType()),
    T.StructField("tile_png", T.BinaryType()),
    T.StructField("image_ids", T.ArrayType(T.StringType())),
    T.StructField("captions", T.ArrayType(T.StringType())),
    T.StructField("placements", T.ArrayType(T.ArrayType(T.IntegerType()))),  # [px, py, w, h]
])


def assign_tiles(df: DataFrame, zoom: int, lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Add (zoom, tile_x, tile_y) via the vectorized tile UDF."""
    from .spatial import tile_udf
    t = tile_udf(zoom)(F.col(lon), F.col(lat))
    return (df.withColumn("_t", t)
              .withColumn("tile_x", F.col("_t.x"))
              .withColumn("tile_y", F.col("_t.y"))
              .withColumn("zoom", F.lit(zoom))
              .drop("_t"))


def materialize_tiles(df: DataFrame, zoom: int, thumb: int = 32,
                      max_per_tile: int = 64, tile_fmt: str = "png",
                      lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Group rows by tile and assemble a PNG mosaic per tile.

    Each image is decoded, downsampled to ``thumb`` x ``thumb`` (nearest
    neighbor — deterministic), and blitted at the position of its occurrence
    point within the tile.  Placement records allow exact extraction for the
    PSNR round-trip check.
    """
    df = assign_tiles(df, zoom, lon, lat)

    def assemble(keys, pdf: pd.DataFrame) -> pd.DataFrame:
        z, tx, ty = int(keys[0]), int(keys[1]), int(keys[2])
        pdf = pdf.sort_values("image_id").head(max_per_tile)
        west, south, east, north = C.tile_bounds(z, tx, ty)
        canvas = np.zeros((TILE_SIZE, TILE_SIZE, 3), dtype=np.uint8)
        ids, caps, placements = [], [], []
        for _, row in pdf.iterrows():
            img = codec.decode(bytes(row["bytes"]))
            h, w, _ = img.shape
            ys = (np.arange(thumb) * h // thumb)
            xs = (np.arange(thumb) * w // thumb)
            small = img[ys][:, xs]
            fx = (row[lon] - west) / (east - west)
            fy = (north - row[lat]) / (north - south)
            px = int(min(max(fx, 0.0), 1.0) * (TILE_SIZE - thumb))
            py = int(min(max(fy, 0.0), 1.0) * (TILE_SIZE - thumb))
            canvas[py:py + thumb, px:px + thumb] = small
            ids.append(row["image_id"])
            caps.append(row["caption"])
            placements.append([px, py, thumb, thumb])
        return pd.DataFrame([{
            "zoom": z, "x": tx, "y": ty, "n_images": len(ids),
            "tile_png": codec.encode(canvas, tile_fmt),
            "image_ids": ids, "captions": caps, "placements": placements,
        }])

    return (df.groupBy("zoom", "tile_x", "tile_y")
              .applyInPandas(assemble, schema=TILE_SCHEMA))


def verify_tiles(tiles_pdf: pd.DataFrame, images_pdf: pd.DataFrame,
                 thumb: int = 32, min_psnr: float = 40.0) -> pd.DataFrame:
    """Per-row invariant check (driver-side over collected samples):
    extract each placement from its tile and compare with the reference
    decode of the original blob (PSNR >= 40 dB) + caption equality."""
    src = images_pdf.set_index("image_id")
    rows = []
    for _, tile in tiles_pdf.iterrows():
        canvas = codec.decode(bytes(tile["tile_png"]))
        placements = [list(p) for p in tile["placements"]]
        for i, (img_id, cap, (px, py, w, h)) in enumerate(
                zip(tile["image_ids"], tile["captions"], placements)):
            # later blits overwrite earlier ones in dense tiles (last writer
            # wins, like a map renderer) — verify only unobstructed placements
            overwritten = any(
                not (qx >= px + w or qx + qw <= px or qy >= py + h or qy + qh <= py)
                for qx, qy, qw, qh in placements[i + 1:])
            got = canvas[py:py + h, px:px + w]
            orig = codec.decode(bytes(src.loc[img_id, "bytes"]))
            hh, ww, _ = orig.shape
            ys = (np.arange(thumb) * hh // thumb)
            xs = (np.arange(thumb) * ww // thumb)
            expected = orig[ys][:, xs]
            p = codec.psnr(expected, got) if not overwritten else float("nan")
            rows.append({
                "image_id": img_id,
                "psnr": p,
                "caption_ok": cap == src.loc[img_id, "caption"],
                "overwritten": overwritten,
                "pass": (overwritten or p >= min_psnr) and cap == src.loc[img_id, "caption"],
            })
    return pd.DataFrame(rows)


# --------------------------------------------------- raster -> vector (M4b)

VECTORIZE_SCHEMA = T.StructType([
    T.StructField("zoom", T.IntegerType()),
    T.StructField("x", T.LongType()),
    T.StructField("y", T.LongType()),
    T.StructField("poly_idx", T.IntegerType()),
    T.StructField("area_px", T.DoubleType()),
    T.StructField("wkb", T.BinaryType()),
])


def vectorize_tiles(tiles: DataFrame, luminance_threshold: float = 8.0,
                    tile_col: str = "tile_png",
                    simplify_tol: float | None = None) -> DataFrame:
    """Raster -> VECTOR: polygonize the occupied region of each rendered
    tile back into lon/lat polygons (the GDAL-polygonize analog closing the
    north rule's raster<->vector loop).

    Per tile (mapInPandas): decode PNG -> luminance mask -> exact binary
    polygonization (kernels.geom.polygonize_mask, boundary-edge stitching)
    -> pixel corners mapped through the exact inverse WebMercator of this
    tile row -> WKB polygons (holes follow ring orientation).  One output
    row per outer ring; embarrassingly parallel over tiles.

    ``simplify_tol`` (PIXEL units): Douglas-Peucker each ring before the
    lon/lat mapping — the per-zoom cartographic generalization a vector-
    tile server applies (≈0.5 px keeps the rendering pixel-identical while
    cutting vertex counts; ``kernels.geom.simplify_ring``)."""
    from collections.abc import Iterator

    from ..kernels import geom as G
    from ..kernels import wkb as W

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("zoom", "x", "y", "poly_idx", "area_px", "wkb")}
            for _, row in pdf.iterrows():
                blob = row[tile_col]
                if blob is None:
                    continue
                img = codec.decode(bytes(blob))
                lum = img.astype(np.float64).mean(axis=2)
                mask = lum > luminance_threshold
                if not mask.any():
                    continue
                z, tx, ty = int(row["zoom"]), int(row["x"]), int(row["y"])
                n = float(1 << z)
                size = float(mask.shape[0])

                def to_lonlat(ring: np.ndarray) -> np.ndarray:
                    lon = (tx + ring[:, 0] / size) / n * 360.0 - 180.0
                    yy = (ty + ring[:, 1] / size) / n
                    lat = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * yy))))
                    return np.stack([lon, lat], axis=1)

                rings = G.polygonize_mask(mask)
                shells = [(abs(G.ring_area(r)), r) for r in rings if G.ring_area(r) < 0]
                holes = [r for r in rings if G.ring_area(r) > 0]
                # pixel y grows downward, so shells come out negative; after
                # the lon/lat flip they are CCW
                for k, (apx, shell) in enumerate(sorted(shells, reverse=True,
                                                        key=lambda t: t[0])):
                    out_shell = (G.simplify_ring(shell, simplify_tol)
                                 if simplify_tol else shell)
                    shell_ll = to_lonlat(out_shell)
                    my_holes = []
                    for h in holes:
                        cx, cy = h[:-1, 0].mean(), h[:-1, 1].mean()
                        if G.point_in_polygon(cx, cy, ("Polygon", [shell])):
                            my_holes.append(to_lonlat(
                                G.simplify_ring(h, simplify_tol)
                                if simplify_tol else h))
                    out["zoom"].append(z)
                    out["x"].append(tx)
                    out["y"].append(ty)
                    out["poly_idx"].append(k)
                    out["area_px"].append(apx)
                    out["wkb"].append(W.dumps(("Polygon", [shell_ll] + my_holes)))
            yield pd.DataFrame(out)

    return tiles.select("zoom", "x", "y", tile_col).mapInPandas(run, schema=VECTORIZE_SCHEMA)


# ------------------------------------------------------- pyramid rollup (M4c)

PYRAMID_SCHEMA = T.StructType([
    T.StructField("zoom", T.IntegerType()),
    T.StructField("x", T.LongType()),
    T.StructField("y", T.LongType()),
    T.StructField("n_children", T.IntegerType()),
    T.StructField("tile_png", T.BinaryType()),
])


def build_pyramid_level(tiles: DataFrame, tile_col: str = "tile_png") -> DataFrame:
    """Zoom N -> N-1 rollup: each parent tile is the 2x2 mosaic of its
    children downsampled by exact 2x2-block mean — the raster analog of a
    hypertable rollup, and the way real tile pipelines build pyramids
    (render the max zoom once, aggregate upward).

    One shuffle keyed by the parent tile (groupBy + applyInPandas, <= 4
    rows per group); applying the function level by level yields the whole
    pyramid in log2(zoom) shuffles."""

    def roll(pdf: pd.DataFrame) -> pd.DataFrame:
        z = int(pdf["zoom"].iloc[0]) - 1
        px, py = int(pdf["px"].iloc[0]), int(pdf["py"].iloc[0])
        canvas = np.zeros((2 * TILE_SIZE, 2 * TILE_SIZE, 3), dtype=np.float64)
        n = 0
        for _, row in pdf.iterrows():
            blob = row[tile_col]
            if blob is None:
                continue
            img = codec.decode(bytes(blob)).astype(np.float64)
            qx = (int(row["x"]) & 1) * TILE_SIZE
            qy = (int(row["y"]) & 1) * TILE_SIZE
            canvas[qy:qy + TILE_SIZE, qx:qx + TILE_SIZE] = img
            n += 1
        # exact 2x2 block mean, then round-half-up to uint8 (deterministic)
        small = canvas.reshape(TILE_SIZE, 2, TILE_SIZE, 2, 3).mean(axis=(1, 3))
        out = np.floor(small + 0.5).clip(0, 255).astype(np.uint8)
        return pd.DataFrame({"zoom": [z], "x": [px], "y": [py],
                             "n_children": [n],
                             "tile_png": [codec.encode(out, "png")]})

    keyed = (tiles.withColumn("px", (F.col("x") / 2).cast("long"))
                  .withColumn("py", (F.col("y") / 2).cast("long")))
    return (keyed.groupBy("zoom", "px", "py")
                 .applyInPandas(roll, schema=PYRAMID_SCHEMA))


def get_tile(spark, tiles_root: str, zoom: int, x: int, y: int) -> DataFrame:
    """Single-tile GET over a materialized tile store (the XYZ endpoint a
    tile server exposes): the store is hive-partitioned by (zoom, x, y)
    (``streaming.retile``), so the three equality predicates resolve as
    PartitionFilters — one directory listed, one file read, regardless of
    pyramid size (plan-gated in tests)."""
    import os

    df = spark.read.parquet(os.path.join(tiles_root, "data"))
    return df.filter((F.col("zoom") == zoom) & (F.col("x") == x)
                     & (F.col("y") == y))


def density_grid(df: DataFrame, zoom: int, size: int = 256,
                 lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Point-density HEATMAP grid: per-(tile, pixel) point counts at
    ``zoom`` with ``size``×``size`` pixels per WebMercator tile.

    Pure JVM column arithmetic (global pixel index → tile = div, pixel =
    mod; no UDF, whole-stage codegen) and ONE map-side-combined hash agg —
    the other raster product a map service serves besides image mosaics,
    and the input to :func:`render_density_tiles`.  Sparse: only hit
    pixels appear."""
    n = float(1 << zoom)
    world = F.lit(n * size)
    gx = F.floor((F.col(lon) + 180.0) / 360.0 * world)
    gx = F.greatest(F.lit(0), F.least(world.cast("long") - 1, gx.cast("long")))
    lat_r = F.radians(F.col(lat))
    merc = F.log(F.tan(lat_r) + F.sqrt(F.tan(lat_r) * F.tan(lat_r) + 1.0))
    gy = F.floor((1.0 - merc / F.lit(float(np.pi))) / 2.0 * world)
    gy = F.greatest(F.lit(0), F.least(world.cast("long") - 1, gy.cast("long")))
    staged = df.select(gx.alias("_gx"), gy.alias("_gy"))
    # exact integer division (subtract the remainder first): a double
    # `/ size` truncation can mis-bin boundary pixels when size is not a
    # power of two
    tile_x = (F.col("_gx") - F.pmod(F.col("_gx"), F.lit(size))) / F.lit(size)
    tile_y = (F.col("_gy") - F.pmod(F.col("_gy"), F.lit(size))) / F.lit(size)
    return (staged.groupBy(
                tile_x.cast("long").alias("tile_x"),
                tile_y.cast("long").alias("tile_y"),
                F.pmod(F.col("_gx"), F.lit(size)).cast("int").alias("px"),
                F.pmod(F.col("_gy"), F.lit(size)).cast("int").alias("py"))
              .agg(F.count(F.lit(1)).alias("cnt")))


DENSITY_TILE_SCHEMA = T.StructType([
    T.StructField("tile_x", T.LongType()),
    T.StructField("tile_y", T.LongType()),
    T.StructField("n_points", T.LongType()),
    T.StructField("max_cnt", T.LongType()),
    T.StructField("tile_png", T.BinaryType()),
])


def render_density_tiles(grid: DataFrame, size: int = 256) -> DataFrame:
    """Render the sparse density grid into grayscale PNG heatmap tiles:
    intensity = cnt scaled linearly to the tile's own max (deterministic —
    no palette/gamma state).  applyInPandas, one group per tile, same
    shuffle shape as the mosaic renderer."""

    def render(keys, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(keys[0]), int(keys[1])
        canvas = np.zeros((size, size), dtype=np.float64)
        canvas[pdf["py"].to_numpy(), pdf["px"].to_numpy()] = pdf["cnt"].to_numpy()
        mx = float(canvas.max())
        img = np.zeros((size, size, 3), dtype=np.uint8)
        if mx > 0:
            gray = np.minimum(255.0, canvas * (255.0 / mx)).astype(np.uint8)
            img[:, :, 0] = img[:, :, 1] = img[:, :, 2] = gray
        return pd.DataFrame([{
            "tile_x": tx, "tile_y": ty,
            "n_points": int(pdf["cnt"].sum()), "max_cnt": int(mx),
            "tile_png": codec.encode(img, "png"),
        }])

    return grid.groupBy("tile_x", "tile_y").applyInPandas(
        render, schema=DENSITY_TILE_SCHEMA)


def count_pyramid(df: DataFrame, zmin: int = 5, zmax: int = 8,
                  lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Multi-zoom TILE COUNT PYRAMID in one corpus pass — the vector-side
    companion of :func:`build_pyramid_level` (which downsamples rasters):
    per-tile row counts at every zoom in [zmin, zmax], the table a tile
    server needs to pick render strategy (count-label vs raster) and the
    pyramid build needs to size work per level.

    Scale shape: the corpus is scanned and aggregated ONCE at the finest
    zoom; every coarser level derives from the previous level's TILE table
    by integer halving (``x >> 1`` — exact because WebMercator tile
    numbers are binary scalings, so floor-halving commutes with the
    clamped floor at each zoom) and re-aggregation.  Level z has at most
    4^z rows, so the log-many coarse aggs shuffle tile-table bytes, not
    corpus bytes.  Returns (zoom, x, y, cnt)."""
    from .spatial import tile_udf
    base = (df.withColumn("_t", tile_udf(zmax)(F.col(lon), F.col(lat)))
              .groupBy(F.col("_t.x").alias("x"), F.col("_t.y").alias("y"))
              .agg(F.count(F.lit(1)).alias("cnt"))
              .withColumn("zoom", F.lit(zmax).cast("int")))
    levels = [base]
    cur = base
    for z in range(zmax - 1, zmin - 1, -1):
        cur = (cur.select(F.shiftright("x", 1).alias("x"),
                          F.shiftright("y", 1).alias("y"), "cnt")
                  .groupBy("x", "y").agg(F.sum("cnt").alias("cnt"))
                  .withColumn("zoom", F.lit(z).cast("int")))
        levels.append(cur)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select("zoom", "x", "y", "cnt")
