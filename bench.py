"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall time of the headline queries.  The dict also
carries the flagship spatial-join + tile-assignment pipeline throughput
(rows/sec) — the north-rule metric — measured over a pre-generated
points-only images table (generation is cached under ``.data/`` and excluded
from timing).  Scaling evidence at two parallelism levels lives in
``tools/bench_scaling.py`` (results recorded in BENCH.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
BENCH_IMAGE_ROWS = int(os.environ.get("BENCH_IMAGE_ROWS", "2000000"))
DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".data")

HEADLINE = [
    "pip_municipality", "knn", "hex_cells", "tiles", "dedup_latest",
    "merge_policies", "quality_histogram", "star_join", "exact_dedup",
    "minhash_pairs", "brute_topk", "text_profile", "hourly_rollup",
    "sessions", "ivf_topk", "hll_distinct", "cms_freq",
    "bbox_count_manifest", "decontamination", "pack_sequences",
    "dedup_clusters", "dwithin", "density_grid", "pq_topk",
    "asof_join", "range_join", "ivfpq_topk", "curation",
    "multimodal_curation", "token_len_quantiles", "knn_join",
    "domain_stats", "gapfill_hourly", "interval_join", "semantic_dedup",
    "dup_gram_fraction", "shard_assign", "adaptive_cells",
    "top_terms", "curation_funnel",
    # round-5 additions:
    "chunk_dedup", "kmeans", "skew_stats", "tile_pyramid",
    "cluster_sample",
]


def _burn(_):
    x = 1.0
    for _i in range(20_000_000):
        x = x * 1.0000001 + 0.1
    return x


def alu_ceiling(nproc: int, rounds: int = 2) -> float:
    """In-window pure-ALU aggregate iterations/sec across ``nproc``
    processes (same burn kernel as tools/bench_scaling.py).  Recorded next
    to the flagship number so a future reader can separate hypervisor steal
    from an engine regression without re-running: flagship rows/sec moves
    with this number when the host is the cause (round-2 verdict item #6).
    Reference on this VM: ~3-6e8 iters/sec at 32 procs."""
    from concurrent.futures import ProcessPoolExecutor
    best = 0.0
    for _ in range(rounds):
        t0 = time.time()
        with ProcessPoolExecutor(nproc) as ex:
            list(ex.map(_burn, range(nproc)))
        best = max(best, nproc * 20e6 / (time.time() - t0))
    return best


def _bench_images(spark) -> str:
    """Deterministic points-only images table, generated once and cached."""
    path = os.path.join(DATA_DIR, f"bench_images_{BENCH_IMAGE_ROWS}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from laji_pygeoapi_spark.sources import fixtures
        df = fixtures.images_df(spark, BENCH_IMAGE_ROWS, with_bytes=False,
                                partitions=int(CPUS) * 2)
        df.write.mode("overwrite").parquet(path)
    return path


def flagship_throughput(spark) -> dict:
    """North-rule pipeline: scan -> cell encode -> broadcast PIP ->
    tile assign -> per-tile count.  Returns rows/sec."""
    from pyspark.sql import functions as F

    from laji_pygeoapi_spark.plans.ingest import ingest_fused

    path = _bench_images(spark)
    images = spark.read.parquet(path).select("image_id", "lon", "lat")
    n = images.count()  # warm the scan/page cache, exclude from timing

    def run_once():
        out = ingest_fused(images, zooms=(9,), include_geometry=False)
        return (out.groupBy("tile_x_z9", "tile_y_z9", "Kunta")
                   .agg(F.count(F.lit(1)).alias("cnt"))
                   .agg(F.sum("cnt"), F.count(F.lit(1))).collect())

    run_once()  # warmup (python workers + plan)
    t0 = time.time()
    result = run_once()
    dt = time.time() - t0
    return {"rows": n, "sec": round(dt, 3), "rows_per_sec": round(n / dt, 1),
            "groups": int(result[0][1]),
            "alu_ceiling": round(alu_ceiling(int(CPUS)), 1),
            "alu_procs": int(CPUS)}


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", CPUS)
    from laji_pygeoapi_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    # warmup at the smallest sf: starts python workers, compiles each plan
    # shape once — bench measures steady-state execution, not JVM cold start
    warm_dir = "/root/testdata/sf0.001"
    from laji_pygeoapi_spark.plans.curation import release_caches
    if os.path.isdir(warm_dir):
        for name in HEADLINE:
            try:
                wdf = queries[name](spark, warm_dir)
                wdf.write.format("noop").mode("overwrite").save()
                release_caches(wdf)
            except Exception:
                pass

    # best-of-2 per query: this VM's CPU supply is time-varying (steal /
    # frequency capping, see BENCH.md); the min of two back-to-back runs
    # measures the engine, not the hypervisor's worst moment
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        best = None
        for _ in range(2):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            # deterministic cache release (round-3 ADVICE): a fused
            # pipeline's persisted projections must not bleed into the
            # next query's timing window
            release_caches(df)
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    fl = flagship_throughput(spark)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "spatial-join+tile throughput (rows/sec) + headline query wall time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "flagship": fl,
        "cpus": int(CPUS),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
