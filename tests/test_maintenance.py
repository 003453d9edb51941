"""Maintenance-job parity tests — ports of the reference's PostGIS SQL
goldens (``pygeoapi/tests/test_edit_db.py``) as Spark jobs."""

import datetime

import pandas as pd
import pyspark.sql.functions as F
import pytest

from laji_pygeoapi_spark.operators import maintenance as M
from laji_pygeoapi_spark.sources import fixtures


def _dedup_frame(spark):
    # reference tests/test_edit_db.py:262-286 — 3 rows, one id duplicated,
    # keep the latest Lataus_pvm -> 2 rows
    pdf = pd.DataFrame({
        "Havainnon_tunniste": ["obs1", "obs1", "obs2"],
        "Lataus_pvm": [datetime.date(2023, 1, 1), datetime.date(2024, 6, 1),
                       datetime.date(2024, 1, 1)],
        "Maara": ["old", "new", "x"],
    })
    return spark.createDataFrame(pdf)


def test_dedup_keep_latest_golden(spark):
    out = M.remove_duplicates(_dedup_frame(spark)).orderBy("Havainnon_tunniste").toPandas()
    assert len(out) == 2
    assert out.loc[out["Havainnon_tunniste"] == "obs1", "Maara"].iloc[0] == "new"


def _merge_frame(spark):
    # reference tests/test_edit_db.py:288-352 — 3 rows -> 2 groups;
    # SUM 5+3=8; AGGREGATE id 'obs1, obs2'; its test policy declares
    # Yksilomaara_tulkittu as SUM (test_edit_db.py:322-325)
    d = datetime.date(2024, 1, 1)
    pdf = pd.DataFrame({
        "Havainnon_tunniste": ["obs1", "obs2", "obs3"],
        "Tieteellinen_nimi": ["Parus major", "Parus major", "Lutra lutra"],
        "Kunta": ["city1", "city1", "city2"],
        "Yksilomaara_tulkittu": [5, 3, 7],
        "Paikan_tarkkuus_metreina_max": [10, 1000, 100],
        "Lataus_pvm": [d, d, d],
        "Maara": ["5", "3", "nan"],
        "geom_kind": ["point", "point", "point"],
    })
    return spark.createDataFrame(pdf)


_TEST_POLICY = {
    "GROUPBY": ["Kunta"],
    "FIRST": ["Tieteellinen_nimi"],
    "AGGREGATE": ["Havainnon_tunniste", "Maara"],
    "SUM": ["Yksilomaara_tulkittu"],
    "MAX": ["Paikan_tarkkuus_metreina_max"],
}


@pytest.mark.parametrize("salted", [False, True])
def test_merge_golden(spark, salted):
    out = M.merge_similar_observations(_merge_frame(spark), salted=salted,
                                       policy=_TEST_POLICY)
    pdf = out.orderBy("Yksilomaara_tulkittu").toPandas()
    assert len(pdf) == 2
    merged = pdf[pdf["Havainnon_tunniste"] == "obs1, obs2"]
    assert len(merged) == 1
    row = merged.iloc[0]
    assert row["Yksilomaara_tulkittu"] == 8                 # SUM policy
    assert row["Paikan_tarkkuus_metreina_max"] == 1000      # MAX policy
    assert row["Tieteellinen_nimi"] == "Parus major"        # FIRST policy
    assert row["Maara"] == "5, 3"                           # AGGREGATE policy
    assert row["Yhdistetty"] == 2                           # merged-count
    solo = pdf[pdf["Havainnon_tunniste"] == "obs3"].iloc[0]
    assert solo["Yhdistetty"] == 1
    assert solo["Maara"] is None   # 'nan' filtered (edit_db.py:418)


def test_salted_equals_unsalted_at_scale(spark):
    from laji_pygeoapi_spark.functions import transform
    raw = spark.createDataFrame(fixtures.raw_occurrences_pdf(400))
    tax = spark.createDataFrame(fixtures.taxonomy_pdf())
    occ = M.remove_duplicates(transform.transform_chain(raw, tax)).cache()
    merged = M.merge_similar_observations(occ)
    cols = sorted(set(merged.columns) - {"geometry"})
    a = (merged.select(*cols)
         .orderBy("Havainnon_tunniste").toPandas().reset_index(drop=True))
    b = (M.merge_similar_observations(occ, salted=True, salt_buckets=7).select(*cols)
         .orderBy("Havainnon_tunniste").toPandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b, check_like=True)


def test_quality_frequency_golden(spark):
    # reference tests/test_edit_db.py:124-144 — 66.67 / 33.33
    pdf = pd.DataFrame({"Aineiston_laatu": ["A", "A", "B"]})
    out = M.quality_frequency(spark.createDataFrame(pdf)).orderBy("Aineiston_laatu").toPandas()
    assert out["percentage"].tolist() == [66.67, 33.33]


def test_bbox_golden(spark):
    # reference tests/test_edit_db.py:105-122 — extent [1,2,3,4]
    from laji_pygeoapi_spark.operators.spatial import extent
    pdf = pd.DataFrame({"lon": [1.0, 3.0, 2.0], "lat": [2.0, 4.0, 3.0]})
    assert extent(spark.createDataFrame(pdf)) == [1.0, 2.0, 3.0, 4.0]


def test_temporal_extent_rfc3339(spark):
    # reference tests/test_edit_db.py:146-166
    pdf = pd.DataFrame({
        "Keruu_aloitus_pvm": [datetime.date(1990, 5, 1), datetime.date(2000, 1, 2)],
        "Keruu_lopetus_pvm": [datetime.date(1991, 6, 2), datetime.date(2020, 12, 31)],
    })
    lo, hi = M.temporal_extent(spark.createDataFrame(pdf))
    assert lo == "1990-05-01T00:00:00Z"
    assert hi == "2020-12-31T00:00:00Z"


def test_collection_metadata_manifest(spark):
    from laji_pygeoapi_spark.functions import transform
    raw = spark.createDataFrame(fixtures.raw_occurrences_pdf(200))
    tax = spark.createDataFrame(fixtures.taxonomy_pdf())
    occ = transform.transform_chain(raw, tax)
    md = M.collection_metadata(occ)
    assert len(md) == 4  # 4 collections in the fixture
    for m in md:
        assert m["count"] > 0
        assert len(m["bbox"]) == 4 and m["bbox"][0] <= m["bbox"][2]
        assert m["temporal"][0] and m["temporal"][0].endswith("Z")
        assert abs(sum(m["quality"].values()) - 100.0) < 0.5


def test_t3_overlapped_maintenance_equals_sequential(spark, tmp_path):
    """T3 (SURVEY §2.10): ingest of batch B overlapped with compaction of
    store A produces byte-identical state to running them sequentially."""
    import pyspark.sql.functions as F
    from laji_pygeoapi_spark.operators import maintenance as M
    from laji_pygeoapi_spark.plans import ingest as ING
    from laji_pygeoapi_spark.sources import fixtures, table as store

    imgs = ING.ingest_fused(fixtures.images_df(spark, 400, with_bytes=False))
    root_a = str(tmp_path / "a")
    store.write_partitioned(imgs, root_a, "seed")

    def ingest_b(root):
        def run():
            return store.write_partitioned(imgs, root, "b")["total_rows"]
        return run

    def compact_a():
        # maintenance job over store A while B ingests elsewhere
        t = store.read_table(spark, root_a)
        return t.groupBy("geom_kind").agg(F.count(F.lit(1)).alias("n")).collect()

    seq_root = str(tmp_path / "seq")
    over_root = str(tmp_path / "over")
    n_seq = ingest_b(seq_root)()
    stats_seq = compact_a()
    out = M.run_overlapped(spark, {"ingest": ingest_b(over_root),
                                   "maintenance": compact_a})
    assert out["ingest"] == n_seq
    assert sorted(map(tuple, out["maintenance"])) == sorted(map(tuple, stats_seq))
    seq = store.read_table(spark, seq_root).orderBy("image_id").toPandas()
    over = store.read_table(spark, over_root).orderBy("image_id").toPandas()
    assert seq.equals(over)


def test_t3_overlapped_task_error_propagates(spark):
    from laji_pygeoapi_spark.operators import maintenance as M
    import pytest as _pytest
    def boom():
        raise ValueError("x")
    with _pytest.raises(RuntimeError, match="overlapped task"):
        M.run_overlapped(spark, {"ok": lambda: 1, "bad": boom})


def test_key_skew_shape_and_exact_percentiles(spark):
    import pandas as pd
    from laji_pygeoapi_spark.operators.maintenance import key_skew
    # 10 keys with counts 1..9 and one hot key with 81 -> total 126
    rows = []
    for k in range(1, 10):
        rows += [{"key": f"k{k}"}] * k
    rows += [{"key": "hot"}] * 81
    out = key_skew(spark.createDataFrame(pd.DataFrame(rows)), "key",
                   top=2).collect()
    assert len(out) == 2
    top = {r["key"]: r for r in out}
    assert top["hot"]["rnk"] == 1 and top["hot"]["cnt"] == 81
    assert top["k9"]["rnk"] == 2 and top["k9"]["cnt"] == 9
    r = out[0]
    assert r["n_keys"] == 10 and r["total_cnt"] == 126 and r["max_cnt"] == 81
    # rank-based percentiles: sorted counts [1..9, 81]; p50 = 5th = 5,
    # p99 = ceil(9.9) = 10th = 81
    assert r["p50_cnt"] == 5 and r["p99_cnt"] == 81
    # skew = floor(1000 * 81 / (126/10)) = floor(810000/126) = 6428
    assert r["skew_x1000"] == 6428
