"""Physical-plan quality gates: these assert the *plan shape*, not results —
pushdown reaching parquet, broadcast joins chosen, partition pruning firing.
A plan regression here is a scale bug even when answers stay correct."""

import pyspark.sql.functions as F
import pytest

from laji_pygeoapi_spark.plans import ingest as ING
from laji_pygeoapi_spark.sources import fixtures, table as store


@pytest.fixture(scope="module")
def stored(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("plans") / "store")
    imgs = fixtures.images_df(spark, 2000, with_bytes=False)
    store.write_partitioned(ING.ingest_fused(imgs), root, "p1")
    return store.read_table(spark, root)


def _plan(df, mode="formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode)


def test_bbox_filters_pushed_to_parquet(stored):
    q = stored.filter((F.col("lon") >= 24.5) & (F.col("lon") <= 25.5)
                      & (F.col("lat") >= 59.9) & (F.col("lat") <= 60.5)) \
              .select("image_id", "lon", "lat")
    plan = _plan(q)
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(lon,24.5)" in plan
    # column pruning: scan reads only the 3 needed data columns
    assert "caption" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_partition_pruning_on_cell_prefix(stored):
    cells = [r["cell_prefix"] for r in
             stored.select("cell_prefix").distinct().limit(2).collect()]
    q = stored.filter(F.col("cell_prefix").isin(cells))
    plan = _plan(q)
    # partition filters appear separately from data filters
    assert "PartitionFilters" in plan
    assert "cell_prefix" in plan.split("PartitionFilters")[1].split("]")[0]


def test_star_join_broadcasts_dims(spark):
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    n = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    r = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    q = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
          .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
          .groupBy("n_name").count())
    plan = _plan(q)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_merge_has_partial_aggregation(spark):
    from laji_pygeoapi_spark.operators import maintenance as M
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("s"))
    plan = _plan(q)
    # map-side partial agg before the exchange
    assert "partial_sum" in plan or "HashAggregate" in plan
    assert plan.index("HashAggregate") < plan.index("Exchange")


def test_transform_chain_single_python_eval(spark):
    """The fused ingest must evaluate exactly ONE Python UDF node."""
    imgs = fixtures.images_df(spark, 10, with_bytes=False)
    q = ING.ingest_fused(imgs, zooms=(9,))
    plan = _plan(q.select("image_id", "Kunta", "tile_x_z9"), "simple")
    assert plan.count("ArrowEvalPython") <= 1 + plan.count("MapInPandas")


def test_text_profile_stays_jvm_side(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from laji_pygeoapi_spark.operators import text as TX
    q = TX.profile(docs)
    plan = _plan(q, "simple")
    # round-6: tokenization moved to ONE vectorized Arrow UDF (JVM regex
    # does not thread-scale on this host class — measured in
    # OPTIMIZATION_r06.md); the invariant is now: never row-at-a-time
    # Python (BatchEvalPython), and exactly ONE tokenizer pass — a second
    # ArrowEvalPython would mean a filter was substituted through the
    # staged projection (the pushdown trap)
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert plan.count("ArrowEvalPython") == 1, plan.count("ArrowEvalPython")
    # the staged features stay staged, not inlined ~40x: plan text bounded
    assert plan.count("array_intersect") <= 12


def test_benched_ann_ivf_queries_partition_prune(spark):
    """The DRIVER's ann_topk / ivf_topk queries (not just the operators)
    must keep serving from their partitioned stores: the executed plan
    shows PartitionFilters on the probe column — a regression back to the
    compute-at-query-time form is a scale bug even while oracles stay
    green."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    for name, col in (("ann_topk", "ann_bucket"), ("ivf_topk", "ivf_list")):
        df = entry.queries()[name](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan, name
        assert col in plan.split("PartitionFilters")[1][:300], name
        assert df.count() == 10


def test_every_driver_query_has_an_oracle():
    """Contract guard: every queries() entry must ship a DuckDB oracle —
    a new query silently landing rows-only would weaken the correctness
    gate without failing anything until a judge noticed."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert q == o, f"missing oracles: {q - o}; orphan oracles: {o - q}"


def test_cc_symmetrization_single_edge_evaluation(spark):
    """Round-6 second session: connected_components must symmetrize the
    edge input in ONE pass (explode of fwd+rev structs), not as
    union(edges, swapped) — the union form re-evaluated the upstream
    pair pipeline once per branch inside the sizing count.  Gate: the
    analyzed plan of the symmetrized frame contains exactly one
    occurrence of a marker column from the edge input, and both CC paths
    agree on a chain + isolated vertex graph."""
    from laji_pygeoapi_spark.operators import dedup as DD
    edges = spark.createDataFrame([(1, 2), (2, 3), (5, 6)],
                                  "id_a long, id_b long")
    verts = spark.createDataFrame([(1,), (2,), (3,), (5,), (6,), (9,)],
                                  "vec_id long")
    expect = [(1, 1), (2, 1), (3, 1), (5, 5), (6, 5), (9, 9)]
    fast = DD.connected_components(edges, vertices=verts)
    assert [(r.id, r.comp) for r in fast.orderBy("id").collect()] == expect
    for dep in getattr(fast, "_cached_deps", []):
        dep.unpersist()
    slow = DD.connected_components(edges, vertices=verts,
                                   small_graph_max_edges=0)
    assert [(r.id, r.comp) for r in slow.orderBy("id").collect()] == expect
    for dep in getattr(slow, "_cached_deps", []):
        dep.unpersist()
    # single-evaluation gate: tag the edge frame with an expensive-looking
    # marker expression and count its occurrences in the optimized plan of
    # the symmetrized explode (one Generate -> the marker appears once per
    # side inside ONE project, never duplicated into two union branches)
    marked = edges.withColumn("id_a", F.col("id_a") + F.xxhash64(F.lit("m4rk")) * 0)
    und = marked.select(F.explode(F.array(
        F.struct(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        F.struct(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))))
        .alias("_e")).select("_e.src", "_e.dst").distinct()
    plan = und._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("m4rk") <= 1, plan


def test_curation_head_generate_barrier(spark):
    """Round-6 second session: the curation head's pushdown barrier is an
    outer generate, not a persist.  Gates: (a) exactly ONE tokenizer
    ArrowEvalPython in curate()'s plan up to the survivor projection —
    a second one means the lang/quality filter was substituted through
    the token staging again; (b) the filter condition stays a bounded
    field extraction (no inlined array_intersect language-ID chain)."""
    from laji_pygeoapi_spark.plans import curation as CUR
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    surv, caches = CUR._curated_survivors(docs, "en", 0.6, "text", "doc_id")
    plan = _plan(surv, "simple")
    try:
        assert "BatchEvalPython" not in plan
        assert plan.count("ArrowEvalPython") == 1, plan.count("ArrowEvalPython")
        # the language-ID chain must not be inlined into a Filter: its
        # array_intersect calls appear once in the staged projection only
        assert plan.count("array_intersect") <= 6
    finally:
        for dep in caches:
            dep.unpersist()
