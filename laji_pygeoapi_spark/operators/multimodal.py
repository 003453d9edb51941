"""Multimodal column operators (driver mandate): decode / resize /
feature-extract / frame-sample over opaque binary columns via mapInPandas.

The container has no image/audio/video libraries, so: PNG and the
deterministic lossy stand-in decode for REAL (kernels.codec); true
JPEG/WebP/audio/video codecs are STUBBED behind ``NotImplementedError`` with
the Spark-side plumbing (schema, batch shape, partition flow) fully real and
tested — swapping in PIL/ffmpeg later only changes the numpy body.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels import codec

FEATURE_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("ok", T.BooleanType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("mean_g", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
    T.StructField("std_gray", T.DoubleType()),
    T.StructField("phash", T.LongType()),
    T.StructField("aspect", T.DoubleType()),
])


def decode_image(blob: bytes, fmt: str | None = None) -> np.ndarray:
    """Decode dispatcher.  Real for PNG + the stand-in codec; STUB otherwise."""
    if blob[:8] == codec._PNG_SIG or blob[:4] == codec._FJPG_MAGIC:
        return codec.decode(blob)
    raise NotImplementedError(
        f"decoder for format {fmt!r} not available in this container (no PIL); "
        "plug a real codec into kernels.codec.decode")


def extract_features(df: DataFrame, bytes_col: str = "bytes",
                     id_col: str = "image_id") -> DataFrame:
    """mapInPandas feature extraction: channel means, gray std, phash, aspect.

    Rows whose payload has no available decoder get ok=false instead of
    failing the job (poison-pill isolation — mandatory at 10^12 rows)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {k: np.full(n, np.nan) for k in ("mean_r", "mean_g", "mean_b", "std_gray", "aspect")}
            ok = np.zeros(n, dtype=bool)
            ph = np.zeros(n, dtype=np.int64)
            for i, blob in enumerate(pdf[bytes_col]):
                if blob is None:
                    continue
                try:
                    img = decode_image(bytes(blob))
                except NotImplementedError:
                    continue
                ok[i] = True
                means = img.reshape(-1, 3).mean(axis=0)
                out["mean_r"][i], out["mean_g"][i], out["mean_b"][i] = means
                out["std_gray"][i] = float(img.mean(axis=2).std())
                out["aspect"][i] = img.shape[1] / img.shape[0]
                ph[i] = codec.quick_phash(img)
            yield pd.DataFrame({id_col: pdf[id_col], "ok": ok, **{k: out[k] for k in
                                ("mean_r", "mean_g", "mean_b")},
                                "std_gray": out["std_gray"], "phash": ph,
                                "aspect": out["aspect"]})

    return df.select(id_col, bytes_col).mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
])


def resize_images(df: DataFrame, size: int = 16, bytes_col: str = "bytes",
                  id_col: str = "image_id", fmt: str = "png") -> DataFrame:
    """mapInPandas nearest-neighbor resize + re-encode (deterministic)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for rid, blob in zip(pdf[id_col], pdf[bytes_col]):
                if blob is None:
                    continue
                try:
                    img = decode_image(bytes(blob))
                except NotImplementedError:
                    continue
                hh, ww, _ = img.shape
                ys = (np.arange(size) * hh // size)
                xs = (np.arange(size) * ww // size)
                blobs.append(codec.encode(img[ys][:, xs], fmt))
                ids.append(rid)
            yield pd.DataFrame({id_col: ids, "bytes": blobs,
                                "w": np.full(len(ids), size, dtype=np.int32),
                                "h": np.full(len(ids), size, dtype=np.int32)})

    return df.select(id_col, bytes_col).mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_video_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """STUB — video decoding needs ffmpeg, absent in this container.
    Kept as the documented extension point with the intended signature:
    (video_id, bytes) -> (video_id, frame_no, frame_png)."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg/pyav, not available here; "
        "the mapInPandas plumbing pattern is extract_features/resize_images")
