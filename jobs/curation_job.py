"""spark-submit entrypoint for the training-data curation pipeline
(north rule: jobs run via ``spark-submit --py-files`` and are
checkpoint-resumable with per-partition lineage).

Usage:
    python tools/make_pyfiles.py              # builds dist/laji_pygeoapi_spark.zip
    spark-submit --master local[8] \
        --py-files dist/laji_pygeoapi_spark.zip \
        jobs/curation_job.py --docs /path/documents.parquet \
        --out /tmp/curated --job-id run1 [--multimodal --phash-col phash]

Steps (each resume-skipped via the store's checkpoint markers):
  1. curate      — lang/quality filter + exact dedup + near-dup drop
                   (single-scan fused pipeline), written as parquet with a
                   lineage manifest (counts + checksums);
  2. quantiles   — fold a token-length quantile sketch of the SURVIVORS
                   into ``<out>/_quantiles`` (the serving-metadata layer).

On a cluster the same command with ``--master yarn``/k8s is unchanged.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="documents parquet path")
    ap.add_argument("--out", required=True, help="output root directory")
    ap.add_argument("--job-id", required=True)
    ap.add_argument("--lang", default="en")
    ap.add_argument("--min-quality", type=float, default=0.6)
    ap.add_argument("--jaccard", type=float, default=0.7)
    ap.add_argument("--multimodal", action="store_true",
                    help="also drop image-phash near-dups (needs --phash-col)")
    ap.add_argument("--phash-col", default="phash")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("laji-curation").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from laji_pygeoapi_spark.plans import curation as CU
    from laji_pygeoapi_spark.sources import table as store

    docs = spark.read.parquet(args.docs)
    t0 = time.time()

    # the lazy curated plan is shared by both steps; deterministic, so a
    # resume that recomputes it sees exactly the rows the first attempt
    # wrote
    if args.multimodal:
        out = CU.multimodal_curate(docs, lang=args.lang,
                                   min_quality=args.min_quality,
                                   jaccard_threshold=args.jaccard,
                                   phash_col=args.phash_col)
    else:
        out = CU.curate(docs, lang=args.lang,
                        min_quality=args.min_quality,
                        jaccard_threshold=args.jaccard)

    def _curate():
        # staged=True: a crash between the parquet commit and the
        # checkpoint marker must not duplicate the survivor set on resume
        # (review finding — the run_step marker alone is not the commit
        # record, the staged manifest is)
        return store.write_partitioned(out, args.out, args.job_id,
                                       partition_cols=(), staged=True)

    doc = store.run_step(args.out, args.job_id, "curate", _curate)

    def _quantiles():
        from laji_pygeoapi_spark.operators.sketch import update_quantile_store
        # sketch THIS JOB'S survivors, not read_table(out): quantile
        # counters SUM on merge, so folding the whole (shared, appendable)
        # store under a per-job delta would re-count every prior job's
        # rows (review finding)
        update_quantile_store(spark, out, f"{args.out}/_quantiles",
                              "n_tokens", batch_id=args.job_id)
        return True

    store.run_step(args.out, args.job_id, "quantiles", _quantiles)
    CU.release_caches(out)

    dt = time.time() - t0
    print(json.dumps({"job_id": args.job_id, "sec": round(dt, 2),
                      "resumed_noop": doc is None,
                      "kept_rows": (doc or {}).get("total_rows")}))


if __name__ == "__main__":
    main()
