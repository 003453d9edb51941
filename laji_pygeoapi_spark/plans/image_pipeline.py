"""The full image flagship: decode -> thumbnail -> spatial join -> tile
assignment, as ONE mapInPandas pass (the scaling-bench workload).

This is the north-star job shape: every image+caption row is decoded
(PNG real / deterministic lossy stand-in), thumbnailed, content-hashed,
assigned its hex cell + municipality (broadcast grid-index PIP) and its
WebMercator tile.  Output is the narrow per-row assignment table the tile
materializer consumes — heavy C-level compute per byte, minimal memory
traffic, which is exactly the profile that scales linearly with cores
(see BENCH.md for the measured two-level scaling).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..kernels import cells as C
from ..kernels import codec
from ..kernels import geom as G
from ..kernels import wkb as W
from ..sources import fixtures

ASSIGN_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("ok", T.BooleanType()),
    T.StructField("phash64", T.LongType()),
    T.StructField("mean_lum", T.DoubleType()),
    T.StructField("cell_r7", T.LongType()),
    T.StructField("Kunta", T.StringType()),
    T.StructField("tile_x", T.LongType()),
    T.StructField("tile_y", T.LongType()),
])


def decode_join_tile(images: DataFrame, zoom: int = 9, thumb: int = 16,
                     municipalities: pd.DataFrame | None = None) -> DataFrame:
    """images(image_id, bytes, caption, lon, lat, ...) -> per-row assignment."""
    muni = municipalities if municipalities is not None else fixtures.municipalities_pdf()
    polys = [(row["id"], (row["name"],),
              (row["minx"], row["miny"], row["maxx"], row["maxy"]),
              W.loads(bytes(row["wkb"])))
             for _, row in muni.iterrows()]
    index = G.PolygonGridIndex(polys)
    name_arr = np.array([p[1][0] for p in polys] + [None], dtype=object)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lo = pdf["lon"].to_numpy(np.float64)
            la = pdf["lat"].to_numpy(np.float64)
            n = len(lo)
            ok = np.zeros(n, dtype=bool)
            ph = np.zeros(n, dtype=np.int64)
            lum = np.full(n, np.nan)
            for i, blob in enumerate(pdf["bytes"]):
                if blob is None:
                    continue
                try:
                    img = codec.decode(bytes(blob))
                except NotImplementedError:
                    continue
                h, w, _ = img.shape
                ys = (np.arange(thumb) * h // thumb)
                xs = (np.arange(thumb) * w // thumb)
                th = img[ys][:, xs]
                ok[i] = True
                ph[i] = codec.quick_phash(th)
                lum[i] = float(th.mean())
            tx, ty = C.mercator_tile(lo, la, zoom)
            midx = index.assign(lo, la)
            yield pd.DataFrame({
                "image_id": pdf["image_id"],
                "ok": ok, "phash64": ph, "mean_lum": lum,
                "cell_r7": C.hex_cell(lo, la, 7),
                "Kunta": name_arr[midx],
                "tile_x": tx, "tile_y": ty,
            })

    cols = [c for c in ("image_id", "bytes", "lon", "lat") if c in images.columns]
    return images.select(*cols).mapInPandas(run, schema=ASSIGN_SCHEMA)
