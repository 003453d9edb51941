"""spark-submit entrypoint for the ingest pipeline (north rule:
"run via spark-submit --py-files at N and 4N executors").

Usage:
    python tools/make_pyfiles.py                 # builds dist/laji_pygeoapi_spark.zip
    spark-submit --master local[8] \
        --py-files dist/laji_pygeoapi_spark.zip \
        jobs/ingest_job.py --rows 100000 --root /tmp/store --job-id run1

On a cluster the same command with ``--master yarn``/k8s and executor
settings is unchanged — the job reads no local state except the store root.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--source", default=None,
                    help="parquet dir of images; default: synthesize --rows")
    ap.add_argument("--root", required=True, help="store root directory")
    ap.add_argument("--job-id", required=True)
    ap.add_argument("--with-bytes", action="store_true")
    ap.add_argument("--bloom-col", default=None,
                    help="also build the manifest Bloom id index on this column")
    ap.add_argument("--sketch-col", default=None,
                    help="also fold an HLL cardinality sketch of this column "
                         "into <root>/_sketch_<col>")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("laji-ingest").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from laji_pygeoapi_spark.plans.ingest import ingest_fused
    from laji_pygeoapi_spark.sources import fixtures, table as store

    if args.source:
        images = spark.read.parquet(args.source)
    else:
        images = fixtures.images_df(spark, args.rows, with_bytes=args.with_bytes)

    t0 = time.time()

    prepared = ingest_fused(images)  # lazy; evaluated by whichever steps run

    def _write():
        return store.write_partitioned(prepared, args.root, args.job_id,
                                       bloom_col=args.bloom_col)

    doc = store.run_step(args.root, args.job_id, "ingest-write", _write)
    if args.sketch_col:
        from laji_pygeoapi_spark.operators.sketch import update_hll_store

        def _sketch():
            update_hll_store(spark, prepared,
                             f"{args.root}/_sketch_{args.sketch_col}",
                             args.sketch_col)
            return True
        store.run_step(args.root, args.job_id, "ingest-sketch", _sketch)
    dt = time.time() - t0
    out = {"job_id": args.job_id, "sec": round(dt, 2),
           "resumed_noop": doc is None,
           "total_rows": (doc or {}).get("total_rows")}
    if doc:
        out["rows_per_sec"] = round(doc["total_rows"] / dt, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
