"""Windowed streaming aggregation + phash near-dup + metadata manifest."""

import json

import pyspark.sql.functions as F

from laji_pygeoapi_spark.streaming.windowed import run_stream_to_memory, windowed_counts


def test_windowed_stream_matches_batch(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "events_stream")
    events.write.mode("overwrite").parquet(src)
    streamed = run_stream_to_memory(spark, src, events.schema,
                                    name="wc_test",
                                    checkpoint=str(tmp_path / "ck"))
    batch = windowed_counts(events)
    a = streamed.orderBy("window_start", "event_type").toPandas()
    b = batch.orderBy("window_start", "event_type").toPandas()
    assert a.equals(b)
    assert len(a) > 0


def test_phash_neardup(spark):
    import pandas as pd
    from laji_pygeoapi_spark.operators import dedup as DD
    def signed64(v: int) -> int:
        return v - (1 << 64) if v >= (1 << 63) else v
    h0 = 0x0123456789ABCDEF
    pdf = pd.DataFrame({
        "image_id": ["a", "b", "c", "d"],
        "phash": [h0, h0 ^ 0b101, signed64(h0 ^ ((1 << 63) | (1 << 2))), -h0],
    })
    out = DD.phash_neardup(spark.createDataFrame(pdf), max_hamming=4).toPandas()
    pairs = set(map(tuple, out[["id_a", "id_b"]].values.tolist()))
    assert ("a", "b") in pairs          # hamming 2
    assert ("a", "c") in pairs          # hamming 2 (different band)
    assert not any("d" in p for p in pairs)
    assert (out["hamming"] <= 4).all()


def test_metadata_manifest_file(spark, tmp_path):
    from laji_pygeoapi_spark.functions import transform
    from laji_pygeoapi_spark.operators import maintenance as M
    from laji_pygeoapi_spark.sources import fixtures
    raw = spark.createDataFrame(fixtures.raw_occurrences_pdf(120))
    tax = spark.createDataFrame(fixtures.taxonomy_pdf())
    occ = transform.transform_chain(raw, tax)
    path = str(tmp_path / "manifest.json")
    docs = M.write_metadata_manifest(occ, path)
    with open(path) as f:
        loaded = json.load(f)
    assert len(loaded["collections"]) == len(docs) == 4
    assert all("bbox" in c and "quality" in c for c in loaded["collections"])
