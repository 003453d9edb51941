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


# ------------------------------------------------------------------ audio

AUDIO_FEATURE_SCHEMA = T.StructType([
    T.StructField("audio_id", T.StringType()),
    T.StructField("ok", T.BooleanType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("rate", T.IntegerType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("peak", T.DoubleType()),
    T.StructField("zcr", T.DoubleType()),
    T.StructField("dom_freq_hz", T.DoubleType()),
])


def audio_features(df: DataFrame, bytes_col: str = "bytes",
                   id_col: str = "audio_id") -> DataFrame:
    """mapInPandas audio feature extraction over PCM16 WAV binary columns:
    duration, RMS, peak, zero-crossing rate and FFT dominant frequency —
    real DSP in numpy (the WAV container parse is kernels.codec.decode_wav;
    compressed formats are stub-gated like the image codecs).  Poison rows
    (null / non-WAV / non-PCM) get ok=false, never fail the job."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            cols = {k: np.full(n, np.nan)
                    for k in ("duration_s", "rms", "peak", "zcr", "dom_freq_hz")}
            rate_out = np.zeros(n, dtype=np.int32)
            ok = np.zeros(n, dtype=bool)
            for i, blob in enumerate(pdf[bytes_col]):
                if blob is None:
                    continue
                try:
                    rate, s = codec.decode_wav(bytes(blob))
                except Exception:  # poison-pill isolation
                    continue
                mono = s.astype(np.float64).mean(axis=1) / 32768.0
                if not len(mono):
                    continue
                ok[i] = True
                rate_out[i] = rate
                cols["duration_s"][i] = len(mono) / rate
                cols["rms"][i] = float(np.sqrt((mono ** 2).mean()))
                cols["peak"][i] = float(np.abs(mono).max())
                cols["zcr"][i] = float((np.diff(np.signbit(mono)) != 0).mean())
                spec = np.abs(np.fft.rfft(mono))
                spec[0] = 0.0  # ignore DC
                cols["dom_freq_hz"][i] = float(np.argmax(spec) * rate / len(mono))
            yield pd.DataFrame({id_col: pdf[id_col], "ok": ok,
                                "duration_s": cols["duration_s"],
                                "rate": rate_out, "rms": cols["rms"],
                                "peak": cols["peak"], "zcr": cols["zcr"],
                                "dom_freq_hz": cols["dom_freq_hz"]})

    return df.select(id_col, bytes_col).mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


RESAMPLE_SCHEMA = T.StructType([
    T.StructField("audio_id", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("rate", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
])


def resample_audio(df: DataFrame, target_rate: int,
                   bytes_col: str = "bytes", id_col: str = "audio_id") -> DataFrame:
    """mapInPandas linear-interpolation resample + PCM16 re-encode
    (deterministic; the audio twin of resize_images)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, n_out = [], [], []
            for rid, blob in zip(pdf[id_col], pdf[bytes_col]):
                if blob is None:
                    continue
                try:
                    rate, s = codec.decode_wav(bytes(blob))
                except (ValueError, NotImplementedError):
                    continue
                mono = s.astype(np.float64).mean(axis=1)
                n_new = max(1, int(round(len(mono) * target_rate / rate)))
                x_new = np.linspace(0.0, len(mono) - 1, n_new)
                res = np.interp(x_new, np.arange(len(mono)), mono)
                pcm = np.clip(res, -32768, 32767).astype(np.int16)
                ids.append(rid)
                blobs.append(codec.encode_wav(pcm, target_rate))
                n_out.append(n_new)
            yield pd.DataFrame({id_col: ids, "bytes": blobs,
                                "rate": np.full(len(ids), target_rate, dtype=np.int32),
                                "n_samples": np.asarray(n_out, dtype=np.int64)})

    return df.select(id_col, bytes_col).mapInPandas(run, schema=RESAMPLE_SCHEMA)


SHARPNESS_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("ok", T.BooleanType()),
    T.StructField("sharpness", T.DoubleType()),
    T.StructField("exposure", T.DoubleType()),
])


def image_quality_signals(df: DataFrame, bytes_col: str = "bytes",
                          id_col: str = "image_id") -> DataFrame:
    """Image-quality curation signals (the visual analog of the text
    quality filters): ``sharpness`` = variance of the 4-neighbor Laplacian
    of the gray image (the standard blur detector — low variance ⇒ soft
    edges ⇒ blurred/near-constant frames worth dropping before training)
    and ``exposure`` = mean gray in [0,1] (clipped-black/white detector).
    mapInPandas over the opaque bytes column, poison-row isolated like
    every multimodal op."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            ok = np.zeros(n, dtype=bool)
            sharp = np.full(n, np.nan)
            expo = np.full(n, np.nan)
            for i, blob in enumerate(pdf[bytes_col]):
                if blob is None:
                    continue
                try:
                    img = decode_image(bytes(blob))
                except NotImplementedError:
                    continue
                ok[i] = True
                gray = img.astype(np.float64).mean(axis=2)
                lap = (-4.0 * gray[1:-1, 1:-1]
                       + gray[:-2, 1:-1] + gray[2:, 1:-1]
                       + gray[1:-1, :-2] + gray[1:-1, 2:])
                sharp[i] = float(lap.var()) if lap.size else 0.0
                expo[i] = float(gray.mean() / 255.0)
            yield pd.DataFrame({id_col: pdf[id_col], "ok": ok,
                                "sharpness": sharp, "exposure": expo})

    return df.select(id_col, bytes_col).mapInPandas(run, schema=SHARPNESS_SCHEMA)
