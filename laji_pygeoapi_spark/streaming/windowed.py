"""Windowed streaming aggregation with watermark (Structured Streaming).

The reference has no true streaming (SURVEY §2.10), but the engine serves a
continuously-appended occurrence/event feed at scale, so the idiomatic-Spark
counterpart is included: event-time tumbling windows with a watermark for
late data, runnable either as a real stream (file source, availableNow) or
as the equivalent batch plan (same expressions — parity is tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours",
                    ts_col: str = "ts", key_col: str = "event_type") -> DataFrame:
    """Tumbling event-time window counts + value sum; watermark bounds state.

    Works on both a streaming DataFrame (late rows beyond the watermark are
    dropped, state is evicted) and a batch DataFrame (identical results for
    in-order data) — the parity test runs both paths on the same files.
    """
    # watermarks require TIMESTAMP (not NTZ); cast on both paths for parity
    src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (src.groupBy(F.window(F.col(ts_col), window).alias("w"), key_col)
               .agg(F.count(F.lit(1)).alias("cnt"),
                    F.round(F.sum("value") * 100, 0).cast("long").alias("sum_cents"))
               .select(F.date_format("w.start", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("window_start"),
                       key_col, "cnt", "sum_cents"))


def run_stream_to_memory(spark: SparkSession, source_dir: str, schema,
                         name: str = "windowed_counts",
                         checkpoint: str | None = None) -> DataFrame:
    """Drive :func:`windowed_counts` as a real stream over a file source with
    ``availableNow`` into a memory sink; returns the result table."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = windowed_counts(stream)
    q = (agg.writeStream.format("memory").queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True))
    if checkpoint:
        q = q.option("checkpointLocation", checkpoint)
    q.start().awaitTermination()
    return spark.table(name)
