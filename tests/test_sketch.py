"""Mergeable HLL / Count-Min sketch tests (operators/sketch.py): hash
determinism vs an independent python reference, merge associativity,
estimate accuracy, and the CMS one-sided error guarantee."""

import math

import pyspark.sql.functions as F
import pytest

from laji_pygeoapi_spark.operators import sketch as SK


def _h32_py(k: int) -> int:
    x = ((k % 2**32) + (k >> 32)) % 2**32
    for _ in range(2):
        x = ((x ^ (x >> 16)) * 73244475) % 2**32
    return x ^ (x >> 16)


def test_hash32_matches_python_reference(spark):
    ks = [0, 1, 123456789, 987654321098, 2**32 - 1, 2**32]
    df = spark.createDataFrame([(k,) for k in ks], "k: long")
    got = [r["h"] for r in
           df.select(SK.hash32(F.col("k")).alias("h")).collect()]
    assert got == [_h32_py(k) for k in ks]
    assert all(0 <= h < 2**32 for h in got)


def test_hll_estimate_accuracy(spark):
    """p=8 (256 registers) has RSE ~6.5%; require within 15% on 3 decades
    of true cardinality, and linear-counting exactness-ish when tiny."""
    for n_true in (40, 1000, 20000):
        df = spark.range(n_true * 3).select(
            (F.col("id") % n_true).alias("k"))  # every key ~3 times
        summ = SK.hll_summary(SK.hll_sketch(df, "k")).collect()[0]
        est = SK.hll_estimate(summ["zero_registers"], summ["s_scaled"])
        assert abs(est - n_true) / n_true < 0.15, (n_true, est)
    tiny = spark.range(100).select((F.col("id") % 5).alias("k"))
    s = SK.hll_summary(SK.hll_sketch(tiny, "k")).collect()[0]
    assert round(SK.hll_estimate(s["zero_registers"], s["s_scaled"])) == 5


def test_hll_merge_equals_whole(spark):
    """Sketch(A ∪ B) == merge(Sketch(A), Sketch(B)) register-for-register —
    the property that makes per-partition sketches a distributed agg."""
    a = spark.range(0, 6000).select((F.col("id") % 700).alias("k"))
    b = spark.range(3000, 12000).select((F.col("id") % 1100).alias("k"))
    whole = SK.hll_sketch(a.unionByName(b), "k")
    merged = SK.hll_merge(SK.hll_sketch(a, "k"), SK.hll_sketch(b, "k"))
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


def test_hll_grouped(spark):
    df = spark.range(9000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 1500).alias("k"))
    out = {r["g"]: r for r in
           SK.hll_summary(SK.hll_sketch(df, "k", ["g"]), ["g"]).collect()}
    assert set(out) == {"0", "1", "2"}
    for g, r in out.items():
        est = SK.hll_estimate(r["zero_registers"], r["s_scaled"])
        assert abs(est - 500) / 500 < 0.15, (g, est)


def test_cms_overestimates_and_is_tight_for_heavy_keys(spark):
    """CMS guarantee: est ≥ true for EVERY key; with N=6000, width=512 the
    expected overshoot is N·e/width ≈ 32 — heavy keys stay within that."""
    # zipf-ish: key j appears 1200/(j+1) times for j < 30
    rows = [(j,) for j in range(30) for _ in range(1200 // (j + 1))]
    df = spark.createDataFrame(rows, "k: long")
    true = {r["k"]: r["c"] for r in
            df.groupBy("k").agg(F.count(F.lit(1)).alias("c")).collect()}
    sk = SK.cms_sketch(df, "k")
    keys = spark.createDataFrame([(j,) for j in range(40)], "k: long")
    est = {r["k"]: r["est"] for r in
           SK.cms_lookup(sk, keys, "k").collect()}
    n_total = sum(true.values())
    bound = math.e * n_total / 512
    for j in range(40):
        t = true.get(j, 0)
        assert est[j] >= t, (j, est[j], t)
        assert est[j] <= t + 6 * bound, (j, est[j], t)
    # every hash row's counters sum to N exactly (each input row increments
    # one bucket per row)
    sums = (sk.groupBy("row").agg(F.sum("cnt").alias("s")).collect())
    assert all(r["s"] == n_total for r in sums)


def test_cms_merge_equals_whole(spark):
    a = spark.range(0, 4000).select((F.col("id") % 37).alias("k"))
    b = spark.range(0, 3000).select((F.col("id") % 53).alias("k"))
    whole = SK.cms_sketch(a.unionByName(b), "k")
    merged = SK.cms_merge(SK.cms_sketch(a, "k"), SK.cms_sketch(b, "k"))
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))
