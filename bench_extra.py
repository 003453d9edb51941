"""Per-query profiling harness for the optimization rounds (guide §1).

NOT the driver contract — ``bench.py`` is frozen for measurement.  This
file exists so optimization work can (a) isolate one query with the noop
sink, (b) capture ``explain("formatted")`` into ``plans/r06/``, and
(c) record an in-window ALU probe next to every timing so numbers from
different host windows are comparable (this VM's CPU supply varies).

Usage::

    python bench_extra.py [--sf SF_DIR] [--plans SUFFIX] [--reps N] [q ...]

With ``--plans before`` each query's formatted plan is written to
``plans/r06/<name>_<suffix>.txt``.  Timing is best-of-``reps`` noop-sink
writes with deterministic cache release between runs (same methodology as
bench.py).  One JSON line per query goes to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _alu_probe() -> float:
    from bench import alu_ceiling
    return alu_ceiling(int(CPUS), rounds=1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--plans", default=None,
                    help="write plans/r06/<name>_<SUFFIX>.txt per query")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--no-warm", action="store_true",
                    help="skip the sf0.001 warmup pass")
    ap.add_argument("--alu", action="store_true",
                    help="record the in-window ALU probe")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_CPUS", CPUS)
    from laji_pygeoapi_spark.session import get_spark

    import __spark_entry__ as entrymod
    from laji_pygeoapi_spark.plans.curation import release_caches

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    names = args.names or [n for n in queries]
    plandir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "plans", "r06")
    if args.plans:
        os.makedirs(plandir, exist_ok=True)

    warm_dir = "/root/testdata/sf0.001"
    if not args.no_warm and os.path.isdir(warm_dir):
        for name in names:
            try:
                spark.sparkContext.setJobDescription(f"warm:{name}")
                wdf = queries[name](spark, warm_dir)
                wdf.write.format("noop").mode("overwrite").save()
                release_caches(wdf)
            except Exception as e:  # noqa: BLE001 — warmup is best-effort
                print(f"# warm {name} failed: {e}", file=sys.stderr)

    for name in names:
        fn = queries[name]
        if args.plans:
            import contextlib
            import io
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plandir, f"{name}_{args.plans}.txt"),
                      "w") as f:
                f.write(buf.getvalue())
            release_caches(df)
        best, samples = None, []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench:{name}")
            t0 = time.time()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            release_caches(df)
            samples.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        rec = {"q": name, "best": round(best, 3), "samples": samples}
        if args.alu:
            rec["alu"] = round(_alu_probe(), 1)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
