"""Regression tests for the round-1 code-review findings."""

import datetime

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from laji_pygeoapi_spark.kernels import wkb as W
from laji_pygeoapi_spark.operators import dedup as DD
from laji_pygeoapi_spark.operators import maintenance as M


def test_merge_with_null_load_date_no_overflow(spark):
    """ANSI int32 overflow on null Lataus_pvm; null dates must lose FIRST."""
    d = datetime.date(2024, 1, 1)
    pdf = pd.DataFrame({
        "Havainnon_tunniste": ["a", "b"],
        "Kunta": ["c1", "c1"],
        "Tieteellinen_nimi": ["dated", "undated"],
        "Lataus_pvm": [d, None],
    })
    pol = {"GROUPBY": ["Kunta"], "FIRST": ["Tieteellinen_nimi"],
           "AGGREGATE": ["Havainnon_tunniste"], "SUM": [], "MAX": []}
    out = M.merge_similar_observations(spark.createDataFrame(pdf), policy=pol).collect()
    assert len(out) == 1
    assert out[0]["Tieteellinen_nimi"] == "dated"  # null date sorts last


def test_knn_max_ring_never_drops_queries(spark):
    """cur_ring doubling past max_ring must still emit every query — and
    (round-2, per ADVICE) queries the bounded ring search cannot answer
    safely fall back to the EXACT distributed scan instead of returning
    empty/inexact results."""
    from laji_pygeoapi_spark.operators import spatial as SP
    from laji_pygeoapi_spark.sources import fixtures
    pts = fixtures.images_df(spark, 50, with_bytes=False)
    # ring=3 doubles to 6 then must clamp AT max_ring=8 (not skip past it);
    # the far query has nothing within its rings -> exact fallback kicks in
    queries = pd.DataFrame({"query_id": ["far", "near"],
                            "lon": [-100.0, -40.0], "lat": [-40.0, -20.0]})
    out = SP.knn_join(spark, pts, queries, k=3, res=7, ring=3, max_ring=8).toPandas()
    far = out[out["query_id"] == "far"]
    assert len(far) == 3                              # exact fallback answered it
    assert set(out["query_id"]) == {"far", "near"}    # nothing dropped
    # the fallback IS exact: compare against the distributed brute force
    bf = SP.knn_bruteforce_distributed(spark, pts, queries.iloc[:1], k=3).toPandas()
    assert sorted(far["image_id"]) == sorted(bf["image_id"])
    # pathological ring > max_ring must not crash either
    out2 = SP.knn_join(spark, pts, queries.iloc[:1], k=3, res=7, ring=100, max_ring=8).toPandas()
    assert len(out2) == 3


def test_embedding_neardup_respects_dimension(spark):
    """Non-16-dim embeddings must not collapse into one LSH bucket."""
    rng = np.random.RandomState(0)
    vecs = rng.standard_normal((60, 32))
    vecs[30] = vecs[5] + 1e-3 * rng.standard_normal(32)
    pdf = pd.DataFrame({"vec_id": range(60), "embedding": [v.tolist() for v in vecs]})
    nd = DD.embedding_neardup(spark.createDataFrame(pdf), threshold=0.98).toPandas()
    assert ((nd["id_a"] == 5) & (nd["id_b"] == 30)).any()
    # sanity: candidate set was pruned (not the full n^2/2 pairs)
    from laji_pygeoapi_spark.operators.similarity import lsh_bucket_expr
    b = (spark.createDataFrame(pdf)
         .select(lsh_bucket_expr(F.col("embedding"), planes=8, seed=1, dim=32).alias("b"))
         .groupBy("b").count().count())
    assert b > 1  # multiple buckets actually used


def test_ewkb_srid_header_consumed():
    """PostGIS EWKB (SRID flag 0x20000000) parses to correct coordinates."""
    import struct
    ewkb = bytes([1]) + struct.pack("<I", 0x20000001) + struct.pack("<I", 4326) \
        + struct.pack("<2d", 24.94, 60.17)
    g = W.loads(ewkb)
    assert g[0] == "Point"
    assert g[1].tolist() == [24.94, 60.17]
    with pytest.raises(NotImplementedError):
        W.loads(bytes([1]) + struct.pack("<I", 0x80000001) + struct.pack("<3d", 1, 2, 3))


def test_tokenless_docs_produce_no_candidate_pairs(spark):
    """Empty/punctuation-only docs must not pairwise-collide in LSH bands."""
    pdf = pd.DataFrame({
        "doc_id": range(8),
        "text": ["", "...", "!!!", None, "", "actual text with tokens here",
                 "actual text with tokens here", "different body entirely"],
    })
    docs = spark.createDataFrame(pdf)
    pairs = DD.minhash_lsh_candidates(docs, num_perm=32, bands=16).toPandas()
    empty_ids = {0, 1, 2, 3, 4}
    assert not any(a in empty_ids or b in empty_ids
                   for a, b in pairs[["id_a", "id_b"]].values)
    assert ((pairs["id_a"] == 5) & (pairs["id_b"] == 6)).any()
    sim = DD.simhash_candidates(docs).toPandas()
    assert not any(a in empty_ids or b in empty_ids
                   for a, b in sim[["id_a", "id_b"]].values)


def test_salt_column_consumed_and_dropped_by_writer(spark, tmp_path):
    from laji_pygeoapi_spark.plans import ingest as ING
    from laji_pygeoapi_spark.sources import fixtures, table as store
    imgs = ING.ingest_fused(fixtures.images_df(spark, 500, with_bytes=False))
    salted = ING.salt_dense_cells(imgs, max_rows_per_task=50)
    assert "_salt" in salted.columns
    root = str(tmp_path / "s")
    doc = store.write_partitioned(salted, root, "j")
    back = store.read_table(spark, root)
    assert "_salt" not in back.columns
    assert back.count() == 500
    assert store.verify_against_manifest(spark, root, "j")["ok"]
