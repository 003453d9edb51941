"""Incremental ingest — T1/T2 (SURVEY §2.10) in two idiomatic-Spark forms.

The reference's incremental mechanism is a persisted ``last_update`` date +
``loadedSameOrAfter`` filter plus blind-append-then-dedup
(``edit_db.py:32-66``, ``main.py:185-186``).  Here:

* ``stream_ingest`` — Structured Streaming over the images directory with
  ``availableNow`` (process-everything-new-then-stop, the batch-friendly
  trigger), checkpointed by Spark itself; each micro-batch runs the same
  cell-encode + partitioned-append used by batch ingest, then the dedup
  compaction job (T2) runs as a separate idempotent step.
* ``batch_incremental`` — watermark-filtered batch append for stores where
  the source is a snapshot table (Iceberg ``loadedSameOrAfter`` equivalent).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import table as store
from ..sources.fixtures import IMAGES_SCHEMA


def stream_ingest(spark: SparkSession, source_dir: str, root: str,
                  checkpoint_dir: str | None = None,
                  bloom_col: str | None = None) -> None:
    """availableNow streaming append of new image files into the store.

    Exactly-once per file via Spark's file-source + checkpoint tracking; the
    foreachBatch body is the shared ingest projection so stream and batch
    rows are bit-identical.  Each micro-batch goes through
    ``write_partitioned``, so STREAMED stores carry the same per-batch
    lineage manifests (counts, envelopes, checksums, optional bloom index)
    as batch-written ones — manifest counts, ``bbox_count`` and bloom GETs
    all work on a store fed only by this stream.
    """
    from ..plans.ingest import ingest_fused
    checkpoint_dir = checkpoint_dir or os.path.join(root, "_stream_checkpoint")
    stream = (spark.readStream.schema(IMAGES_SCHEMA)
              .option("maxFilesPerTrigger", 64)
              .parquet(source_dir))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # staged=True makes the append EXACTLY-ONCE under foreachBatch
        # replay (round-3 ADVICE): the per-batch manifest is the commit
        # marker; a replayed committed batch is a no-op, a half-published
        # one is healed before re-appending.
        prepared = ingest_fused(batch_df)
        store.write_partitioned(prepared, root, f"stream-{batch_id}",
                                bloom_col=bloom_col, staged=True)

    (stream.writeStream.foreachBatch(process_batch)
           .option("checkpointLocation", checkpoint_dir)
           .trigger(availableNow=True)
           .start()
           .awaitTermination())


def batch_incremental(spark: SparkSession, source: DataFrame, root: str,
                      job_id: str, load_date_col: str = "load_date") -> dict:
    """Watermark batch: filter source rows at/after the stored watermark,
    append + manifest, advance the watermark (reference T1 semantics:
    read-then-advance, ``edit_db.py:32-66``)."""
    wm = store.load_watermark(root)
    incoming = source if wm is None else source.filter(F.col(load_date_col) >= F.lit(wm))
    doc = store.write_partitioned(incoming, root, job_id)
    new_wm = source.agg(F.max(load_date_col)).first()[0]
    if new_wm is not None:
        store.save_watermark(root, str(new_wm))
    return doc


def stream_dedup(events: DataFrame, key_cols=("event_id",),
                 ts_col: str = "ts", watermark: str = "1 hour") -> DataFrame:
    """T2 as a TRUE stream: exactly-once-per-key emission with bounded
    state via ``dropDuplicatesWithinWatermark`` — re-deliveries of the same
    key within the watermark horizon are suppressed, and state for keys
    older than the watermark is evicted (the property a plain
    ``dropDuplicates`` on a stream lacks: its state grows forever).

    Batch parity: on a bounded, in-order source this equals batch
    ``dropDuplicates(key_cols)`` (pytest-gated).  At 10^12 events the state
    store holds only the watermark horizon — the same bounded-state shape
    as the windowed aggregation path."""
    src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
        return src.dropDuplicatesWithinWatermark(list(key_cols))
    return src.dropDuplicates(list(key_cols))


def stream_quantiles(spark: SparkSession, source_dir: str, store_root: str,
                     value_col: str, group_cols=(), b: int = 5,
                     schema=None, checkpoint_dir: str | None = None) -> None:
    """Streaming quantile maintenance: each micro-batch's log-bucket
    counters land in the batch's OWN delta directory
    (``sketch.update_quantile_store``), so a foreachBatch replay
    overwrites rather than double-counts — the exactly-once form the
    sum-merged counters need (HLL's max-merge is idempotent by itself;
    sums are not).  Readers merge live deltas at metadata cost
    (``read_quantile_store``); ``compact_quantile_store`` bounds the
    delta count with supersession-marker crash safety."""
    from ..operators import sketch as SK
    checkpoint_dir = checkpoint_dir or store_root + "_checkpoint"
    stream = (spark.readStream.schema(schema or IMAGES_SCHEMA)
              .option("maxFilesPerTrigger", 64)
              .parquet(source_dir))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        SK.update_quantile_store(spark, batch_df, store_root, value_col,
                                 group_cols=group_cols, b=b,
                                 batch_id=batch_id)

    (stream.writeStream.foreachBatch(process_batch)
           .option("checkpointLocation", checkpoint_dir)
           .trigger(availableNow=True)
           .start()
           .awaitTermination())


def stream_decontaminate(spark: SparkSession, source_dir: str,
                         gram_store: str, out_root: str, schema,
                         checkpoint_dir: str | None = None) -> None:
    """Streaming benchmark decontamination — the at-scale shape of the
    hygiene pass: the EVAL SET is fixed (its distinct gram hashes persist
    once via ``dedup.write_gram_store``) while the corpus STREAMS.  Each
    micro-batch broadcast-semi-joins the store's pre-distinct hashes (no
    benchmark tokenize per batch, no state store — the join side is a
    static tiny scan) and appends its flagged ``(doc_id, n_overlaps)``
    rows EXACTLY-ONCE via the staged append protocol (a foreachBatch
    replay of a committed batch is a no-op; a half-published one heals).
    Batch parity: union of all batches == ``ngram_overlap`` over the
    concatenated corpus, because per-doc gram counting never crosses
    documents (pytest-gated)."""
    from ..operators import dedup as DD
    checkpoint_dir = checkpoint_dir or os.path.join(out_root,
                                                    "_stream_checkpoint")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 64)
              .parquet(source_dir))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        flagged = DD.ngram_overlap_stored(spark, batch_df, gram_store)
        store.write_partitioned(flagged, out_root, f"decon-{batch_id}",
                                staged=True)

    (stream.writeStream.foreachBatch(process_batch)
           .option("checkpointLocation", checkpoint_dir)
           .trigger(availableNow=True)
           .start()
           .awaitTermination())


def stream_sketch(spark: SparkSession, source_dir: str, sketch_root: str,
                  key_col: str, group_cols=(), p: int = 8,
                  schema=None, checkpoint_dir: str | None = None) -> None:
    """Streaming cardinality maintenance: fold each micro-batch's HLL
    registers into a persisted register store (``operators.sketch``).

    The register table is an associative, idempotent-per-key max — so the
    stream never rescans history, state is bounded at 2^p rows per group
    regardless of input size, and the stored sketch after any prefix of
    batches EQUALS the batch sketch of their union (register-exact,
    pytest-gated).  This is the metadata-catalog shape for 10^12-row
    stores: "distinct observers per collection" stays current per append
    at metadata cost."""
    from ..operators import sketch as SK
    checkpoint_dir = checkpoint_dir or sketch_root + "_checkpoint"
    stream = (spark.readStream.schema(schema or IMAGES_SCHEMA)
              .option("maxFilesPerTrigger", 64)
              .parquet(source_dir))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        SK.update_hll_store(spark, batch_df, sketch_root, key_col,
                            group_cols=group_cols, p=p)

    (stream.writeStream.foreachBatch(process_batch)
           .option("checkpointLocation", checkpoint_dir)
           .trigger(availableNow=True)
           .start()
           .awaitTermination())
