"""Two-parallelism-level scaling bench (north rule: N vs 4N executors).

No real cluster exists in this sandbox, so — per the driver instructions —
the same flagship job (image decode -> thumbnail -> broadcast PIP join ->
hex cell + tile assignment -> per-tile agg) runs on the same input at
local[N] and local[4N] in separate JVMs, reporting throughput at both plus
``efficiency = thr(4N) / (4 * thr(N))``.

**Hardware calibration.** This sandbox VM does not provide 4x the CPU
cycles when going 8 -> 32 processes: a pure-ALU burn test (no memory, no
Spark, plain multiprocessing) measures the hypervisor's own scaling ceiling
(frequency capping + steal time).  The bench therefore (a) uses N=1 vs 4N=4
by default — the range where the VM's cycle supply is ~linear — and (b)
prints the ALU ceiling next to the engine number so the engine's efficiency
can be judged against what the box can physically deliver
(``engine_vs_hw = efficiency / hw_ceiling``).

Usage: python tools/bench_scaling.py [N] [rows] -> one JSON line + a row in
BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from concurrent.futures import ProcessPoolExecutor

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 250_000
WORKLOAD = sys.argv[3] if len(sys.argv) > 3 else "flagship"
# best-of-REPS per level; large-row legs (e.g. the 1M curation leg, ~25 min
# per local[1] repetition) pass 2 to stay inside a wall-clock budget
REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 3
N4 = 4 * N


def _burn(_):
    x = 1.0
    for _i in range(20_000_000):
        x = x * 1.0000001 + 0.1
    return x


def alu_rate(nproc: int) -> float:
    """Aggregate pure-ALU iterations/sec across nproc processes (best of 3)."""
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        with ProcessPoolExecutor(nproc) as ex:
            list(ex.map(_burn, range(nproc)))
        rate = nproc * 20e6 / (time.time() - t0)
        best = max(best, rate)
    return best


WORKER = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
cpus = sys.argv[1]
rows = int(sys.argv[2])
reps = int(sys.argv[3])
os.environ["SPARK_GRAFT_CPUS"] = cpus
from laji_pygeoapi_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=max(int(cpus), 4))
spark.sparkContext.setLogLevel("ERROR")
# IMPORTANT: a pre-materialized subset, not .limit(n) — CollectLimit is a
# single-task stage and would serialize the scan at every parallelism level
src = f"/root/repo/.data/bench_images_bytes_{rows}"
if not os.path.exists(os.path.join(src, "_SUCCESS")):
    from laji_pygeoapi_spark.sources import fixtures
    fixtures.images_df(spark, rows, with_bytes=True, partitions=32) \
        .write.mode("overwrite").parquet(src)
# split the scan fine enough that EVERY parallelism level gets >=4 tasks
# per core (32 x ~30MB files read at the default 128MB maxPartitionBytes
# gave exactly 32 tasks: one single wave at local[32], so one straggler
# set the wall while local[8] load-balanced over 4 waves — that measured
# task granularity, not scaling)
spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
img = spark.read.parquet(src)
n = img.count()
from laji_pygeoapi_spark.plans.image_pipeline import decode_join_tile
def run_once():
    out = decode_join_tile(img)
    (out.groupBy("tile_x", "tile_y", "Kunta")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum(F.col("ok").cast("long")).alias("n_ok"))
        .write.format("noop").mode("overwrite").save())
# warmup on a slice: starts python workers, compiles the plan
decode_join_tile(img.limit(5000)).write.format("noop").mode("overwrite").save()
best = None
for _ in range(reps):
    t0 = time.time()
    run_once()
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({"cpus": int(cpus), "rows": n, "sec": round(best, 3),
                  "rows_per_sec": round(n / best, 1)}))
"""


# Second workload (the north rule's scaling criterion should not rest on
# one pipeline shape): the TEXT-CURATION pipeline — profile + filters +
# exact dedup window + fused MinHash near-dup — whose cost profile is
# shuffle/window/LSH-join rather than the flagship's mapInPandas decode.
# Input: documents replicated with remapped ids and a per-replica suffix
# token (so exact dedup keeps them distinct), pre-materialized once.
WORKER_CURATION = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
cpus = sys.argv[1]
rows = int(sys.argv[2])
reps = int(sys.argv[3])
os.environ["SPARK_GRAFT_CPUS"] = cpus
from laji_pygeoapi_spark.session import get_spark
from pyspark.sql import functions as F
# shuffle-heavy workload: several tasks PER CORE per shuffle stage, or the
# higher level runs each shuffle as one straggler-bound wave (the same
# task-granularity artifact the 8->32 scan fix addressed, round 3)
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=max(4 * int(cpus), 8))
spark.sparkContext.setLogLevel("ERROR")
# at toy scale AQE's 64MB advisory target coalesces every shuffle of this
# ~10MB corpus to ONE partition — a serial stage at every level.  At real
# scale partitions sit at the target size anyway; a small advisory keeps
# the bench measuring the engine, not an artifact of tiny input.
spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512k")
spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
src = f"/root/repo/.data/bench_docs_{rows}"
if not os.path.exists(os.path.join(src, "_SUCCESS")):
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n_base = base.count()
    # NOTE: do not shadow `reps` (the timing repetition count) — a fresh
    # corpus build used to rebind it to the replica count, silently
    # running the timing loop rows/n_base times (50x at 250k rows)
    n_replicas = max(1, rows // n_base)
    rep = spark.range(n_replicas).select(F.col("id").alias("rep"))
    (base.crossJoin(rep)
         .select((F.col("doc_id") + F.col("rep") * F.lit(10_000_000)).alias("doc_id"),
                 F.concat(F.col("text"), F.lit(" replica"),
                          F.col("rep").cast("string")).alias("text"),
                 "source")
         .repartition(32)
         .write.mode("overwrite").parquet(src))
spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
docs = spark.read.parquet(src)
n = docs.count()
from laji_pygeoapi_spark.plans.curation import curate, release_caches
def run_once():
    out = curate(docs)
    out.write.format("noop").mode("overwrite").save()
    release_caches(out)  # persisted survivor projection must not pile up
                         # across repetitions (OOMed the 1M-row leg)
curate(docs.limit(2000)).write.format("noop").mode("overwrite").save()  # warm
best = None
for _ in range(reps):
    t0 = time.time()
    run_once()
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({"cpus": int(cpus), "rows": n, "sec": round(best, 3),
                  "rows_per_sec": round(n / best, 1)}))
"""


def run_level(cpus: int) -> dict:
    worker = WORKER_CURATION if WORKLOAD == "curation" else WORKER
    out = subprocess.run([sys.executable, "-c", worker, str(cpus), str(ROWS),
                          str(REPS)],
                         capture_output=True, text=True, check=False)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"worker local[{cpus}] failed:\n{out.stderr[-3000:]}")


def main() -> None:
    alu_n = alu_rate(N)
    low = run_level(N)
    alu_n4 = alu_rate(N4)
    high = run_level(N4)
    hw_ceiling = alu_n4 / (4.0 * alu_n)
    eff = high["rows_per_sec"] / (4.0 * low["rows_per_sec"])
    desc = ("text-curation (profile+dedup+minhash) throughput scaling"
            if WORKLOAD == "curation"
            else "image decode+spatial-join+tile throughput scaling")
    result = {
        "metric": f"{desc}, local[{N}] vs local[{N4}]",
        "rows": low["rows"],
        f"local{N}": low, f"local{N4}": high,
        "efficiency": round(eff, 3),
        "hw_cycle_ceiling": round(hw_ceiling, 3),
        "engine_vs_hw": round(min(eff / hw_ceiling, 1.5), 3) if hw_ceiling else None,
        "passes_0_8": eff >= 0.8,
    }
    print(json.dumps(result))
    os.makedirs("/root/repo", exist_ok=True)
    header_needed = not os.path.exists("/root/repo/BENCH.md")
    with open("/root/repo/BENCH.md", "a") as f:
        if header_needed:
            f.write("# BENCH — scaling runs\n\n"
                    "| N | 4N | rows | thr(N) r/s | thr(4N) r/s | eff | hw ceiling | eng/hw | verdict |\n"
                    "|---|----|------|-----------|------------|-----|-----------|--------|---------|\n")
        tag = "" if WORKLOAD == "flagship" else f" ({WORKLOAD})"
        f.write(f"| {N} | {N4} | {low['rows']}{tag} | {low['rows_per_sec']:.0f} | "
                f"{high['rows_per_sec']:.0f} | {eff:.3f} | {hw_ceiling:.3f} | "
                f"{result['engine_vs_hw']} | {'PASS' if eff >= 0.8 else 'FAIL'} |\n")


if __name__ == "__main__":
    main()
