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


def test_phash_candidates_bounded_on_degenerate_corpus(spark):
    """Round-2 verdict fix #2: an all-identical-phash corpus (near-black
    frames) collapses into one bucket per band; routed through
    _bucket_pairs the expansion caps at C(256,2) instead of C(n,2), and
    planted near-dups among the kept ids still surface."""
    import pandas as pd
    from laji_pygeoapi_spark.operators import dedup as DD
    n = 600
    pdf = pd.DataFrame({"image_id": [f"i{k:04d}" for k in range(n)],
                        "phash": [0x00FF00FF00FF00FF] * n})
    cand = DD.phash_candidates(spark.createDataFrame(pdf))
    cap = 256
    assert cand.count() == cap * (cap - 1) // 2
    assert (cand.agg(F.max("hamming")).first()[0]) == 0
    # recall on a planted pair within a normal corpus is unchanged
    pdf2 = pd.DataFrame({"image_id": ["a", "b", "c"],
                         "phash": [100, 100 ^ 0b11, -(1 << 40)]})
    out = DD.phash_neardup(spark.createDataFrame(pdf2), max_hamming=4).toPandas()
    assert set(map(tuple, out[["id_a", "id_b"]].values.tolist())) == {("a", "b")}


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


def test_sessionize_batch_golden(spark):
    import pandas as pd
    from laji_pygeoapi_spark.streaming.sessions import sessionize_batch
    pdf = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5, 6],
        "user_id": [1, 1, 1, 2, 2, 1],
        "ts": pd.to_datetime(["2020-01-01 10:00:00", "2020-01-01 10:10:00",
                              "2020-01-01 11:30:00",  # > 30 min gap -> new session
                              "2020-01-01 09:00:00", "2020-01-01 09:20:00",
                              "2020-01-01 11:40:00"]),
        "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
    })
    out = sessionize_batch(spark.createDataFrame(pdf)).orderBy(
        "user_id", "session_no").toPandas()
    assert out[["user_id", "session_no", "n_events", "duration_us"]].values.tolist() == [
        [1, 1, 2, 600_000_000], [1, 2, 2, 600_000_000], [2, 1, 2, 1_200_000_000]]
    assert out["sum_cents"].tolist() == [300, 900, 900]


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Custom stateful streaming operator (applyInPandasWithState): closed
    sessions from the stream equal the batch window-function result."""
    import pandas as pd
    from laji_pygeoapi_spark.streaming.sessions import (sessionize_batch,
                                                        sessionize_stream)
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
                       .select("event_id", "user_id", "ts", "value")
    src = str(tmp_path / "sess_stream")
    events.write.mode("overwrite").parquet(src)
    # sentinel batch far in the future pushes the watermark past every
    # open session so the stream closes them all
    far = events.limit(1).select(
        F.lit(10 ** 9).alias("event_id"), F.lit(-1).cast("long").alias("user_id"),
        (F.col("ts").cast("timestamp") + F.expr("INTERVAL 365 DAYS")).alias("ts"),
        F.lit(0.0).alias("value"))
    far.write.mode("overwrite").parquet(str(tmp_path / "sess_stream2"))
    import shutil, os
    for f in os.listdir(str(tmp_path / "sess_stream2")):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(str(tmp_path / "sess_stream2"), f),
                        os.path.join(src, "zz_" + f))
    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 1).parquet(src)
    out = sessionize_stream(stream, watermark="30 minutes")
    q = (out.writeStream.format("memory").queryName("sess_test")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck_sess"))
            .trigger(availableNow=True))
    q.start().awaitTermination()
    got = (spark.table("sess_test").filter(F.col("user_id") >= 0)
           .withColumn("session_start", F.date_format("session_start", "yyyy-MM-dd'T'HH:mm:ss'Z'"))
           .withColumn("session_end", F.date_format("session_end", "yyyy-MM-dd'T'HH:mm:ss'Z'"))
           .withColumn("sum_cents", F.round(F.col("sum_value") * 100, 0).cast("long"))
           .select("user_id", "session_start", "session_end", "n_events", "sum_cents")
           .orderBy("user_id", "session_start").toPandas())
    exp = (sessionize_batch(events)
           .select("user_id", "session_start", "session_end", "n_events", "sum_cents")
           .orderBy("user_id", "session_start").toPandas())
    assert len(got) > 0
    assert got.equals(exp), (len(got), len(exp))


def test_stream_dedup_exactly_once(spark, tmp_path):
    """T2 streaming dedup: duplicated deliveries collapse to one row per
    key; equals batch dropDuplicates on the same files."""
    import pandas as pd
    from laji_pygeoapi_spark.streaming.incremental import stream_dedup
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
              .select("event_id", "user_id", "ts", "value").limit(500)
    src = str(tmp_path / "dup_stream")
    # write the same rows twice (two files = two micro-batch deliveries)
    ev.write.mode("overwrite").parquet(src)
    ev.write.mode("append").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = stream_dedup(stream)
    (out.writeStream.format("memory").queryName("dedup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_dd"))
        .trigger(availableNow=True).start().awaitTermination())
    got = spark.table("dedup_test")
    n_batch = stream_dedup(spark.read.parquet(src)).count()
    assert got.count() == n_batch == 500
    assert got.select("event_id").distinct().count() == 500


def test_asof_join_semantics(spark):
    """As-of semantics on a hand-built frame: <= tie matches, no-prior ->
    null, greatest order_col wins among same-ts right rows, and per-key
    isolation."""
    import datetime as dt
    import pandas as pd
    from laji_pygeoapi_spark.operators.temporal import asof_join
    t = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)
    left = spark.createDataFrame(pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "user_id": [7, 7, 7, 8],
        "ts": [t(5), t(10), t(2), t(10)],
    }))
    right = spark.createDataFrame(pd.DataFrame({
        "user_id": [7, 7, 7, 8],
        "ts": [t(5), t(5), t(8), t(30)],
        "value": [1.0, 2.0, 3.0, 9.0],
        "r_event": [100, 101, 102, 103],
    }))
    out = {r["event_id"]: r for r in
           asof_join(left, right, ["user_id"], "ts",
                     value_cols=["value", "r_event"],
                     order_col="r_event").collect()}
    assert out[1]["r_event_asof"] == 101      # tie at ts=5: greatest r_event
    assert out[1]["value_asof"] == 2.0
    assert out[2]["r_event_asof"] == 102      # latest <= 10 is ts=8
    assert out[3]["r_event_asof"] is None     # ts=2: nothing prior
    assert out[4]["r_event_asof"] is None     # user 8: right row is FUTURE


def test_range_join_point_matches_bruteforce(spark):
    """Bin-bucketed range join equals the brute-force theta join on random
    data across bin sizes (coverage: intervals shorter, equal and longer
    than the bin)."""
    import pandas as pd
    import numpy as np
    from laji_pygeoapi_spark.operators.temporal import range_join_point
    rng = np.random.RandomState(5)
    n_p, n_i = 400, 60
    pts = pd.DataFrame({
        "pid": range(n_p),
        "k": rng.randint(0, 5, n_p),
        "ts": pd.to_datetime(rng.randint(0, 3 * 86400, n_p), unit="s"),
    })
    start = rng.randint(0, 3 * 86400, n_i)
    length = rng.randint(60, 4 * 3600, n_i)
    iv = pd.DataFrame({
        "iid": range(n_i),
        "k": rng.randint(0, 5, n_i),
        "start": pd.to_datetime(start, unit="s"),
        "end": pd.to_datetime(start + length, unit="s"),
    })
    P, I = spark.createDataFrame(pts), spark.createDataFrame(iv)
    want = set()
    for _, p in pts.iterrows():
        for _, i in iv.iterrows():
            if p["k"] == i["k"] and i["start"] <= p["ts"] <= i["end"]:
                want.add((p["pid"], i["iid"]))
    for bin_s in (600, 3600, 86400):
        got = {(r["pid"], r["iid"]) for r in
               range_join_point(P, I, ["k"], "ts", bin_seconds=bin_s)
               .select("pid", "iid").collect()}
        assert got == want, bin_s
    assert len(want) > 0


def test_interval_overlap_join_exact_once_per_pair(spark):
    """Pairs overlapping across MANY shared bins must appear exactly once
    (first-shared-bin trick, no dedup shuffle), boundary-touching
    intervals count as overlapping, disjoint ones never match, and column
    collisions are refused."""
    import pyspark.sql.functions as F
    import pytest
    from laji_pygeoapi_spark.operators.temporal import interval_overlap_join
    li = spark.createDataFrame([
        (1, "2024-01-01 00:00:00", "2024-01-01 10:00:00"),  # spans 10 bins
        (2, "2024-01-01 05:00:00", "2024-01-01 05:30:00"),
        (3, "2024-01-02 00:00:00", "2024-01-02 01:00:00"),
    ], "l_id long, l_start string, l_end string") \
        .withColumn("l_start", F.to_timestamp("l_start")) \
        .withColumn("l_end", F.to_timestamp("l_end"))
    ri = spark.createDataFrame([
        (10, "2024-01-01 00:30:00", "2024-01-01 09:30:00"),  # 9 shared bins with l1
        (11, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),  # touches l1 boundary
        (12, "2024-01-03 00:00:00", "2024-01-03 01:00:00"),  # disjoint
    ], "r_id long, r_start string, r_end string") \
        .withColumn("r_start", F.to_timestamp("r_start")) \
        .withColumn("r_end", F.to_timestamp("r_end"))
    got = sorted((r["l_id"], r["r_id"]) for r in
                 interval_overlap_join(li, ri, bin_seconds=3600).collect())
    assert got == [(1, 10), (1, 11), (2, 10)]
    with pytest.raises(ValueError, match="collision"):
        interval_overlap_join(li, li)
