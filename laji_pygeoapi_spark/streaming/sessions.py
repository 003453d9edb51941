"""Gap-based sessionization — batch (window functions) and streaming
(custom stateful operator via ``applyInPandasWithState``).

The reference's event/request feed has no session concept, but a
continuously-appended event table at scale needs one (the canonical custom
stateful streaming operator the driver mandates).  Two parity-tested forms:

* :func:`sessionize_batch` — pure window functions: a new session starts
  when the gap to the previous event of the same user exceeds ``gap``;
  session id = running sum of gap-break flags.  SQL-expressible, so it has
  a DuckDB oracle (``__spark_entry__.oracle_sql['sessions']``).
* :func:`sessionize_stream` — ``applyInPandasWithState`` keyed by user:
  state carries the open session (start, last ts, count, value sum);
  event-time timeout closes sessions when the watermark passes
  ``last_ts + gap``.  Emits only CLOSED sessions; the parity test flushes
  with a far-future sentinel and compares to the batch result.

Scale: both forms shuffle once on ``user_id``; streaming state per key is
O(1) (one open session), evicted by timeout — the shape that survives an
unbounded feed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_SECONDS = 1800


def sessionize_batch(events: DataFrame, gap_s: int = GAP_SECONDS,
                     user_col: str = "user_id", ts_col: str = "ts",
                     id_col: str = "event_id",
                     value_col: str = "value") -> DataFrame:
    """Per-user gap sessionization as two windows + one aggregation.

    Deterministic ordering: (ts, event_id) — event ids tie-break equal
    timestamps so both engines number sessions identically.  All time
    arithmetic is MICROSECOND-exact (unix_micros / DuckDB epoch_us):
    casting sub-second timestamps to whole seconds truncates in Spark but
    rounds in DuckDB, which silently shifts gap decisions.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(ts_us).over(w)
    brk = F.when(prev.isNull() | ((ts_us - prev) > gap_s * 1_000_000), 1).otherwise(0)
    with_sess = (events.withColumn("_brk", brk)
                       .withColumn("session_no", F.sum("_brk").over(
                           w.rowsBetween(Window.unboundedPreceding, 0))))
    return (with_sess.groupBy(user_col, "session_no")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.date_format(F.min(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("session_start"),
                 F.date_format(F.max(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("session_end"),
                 (F.max(F.unix_micros(F.col(ts_col).cast("timestamp")))
                  - F.min(F.unix_micros(F.col(ts_col).cast("timestamp")))).alias("duration_us"),
                 F.round(F.sum(value_col) * 100, 0).cast("long").alias("sum_cents")))


_SESSION_OUT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
])

_SESSION_STATE = "start LONG, last LONG, n LONG, sum_value DOUBLE"


def _session_fn(gap_s: int):
    def fn(key, pdfs, state: GroupState):
        import pandas as _pd
        (user,) = key
        if state.hasTimedOut:
            start, last, n, sv = state.get
            state.remove()
            yield _pd.DataFrame({
                "user_id": [user],
                "session_start": [_pd.Timestamp(start, unit="us")],
                "session_end": [_pd.Timestamp(last, unit="us")],
                "n_events": [n], "sum_value": [sv]})
            return
        rows = _pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        ts = (rows["ts"].astype("datetime64[ns]").astype("int64") // 1000).to_numpy()
        vals = rows["value"].to_numpy()
        closed = []
        if state.exists:
            start, last, n, sv = state.get
        else:
            start, last, n, sv = ts[0], ts[0], 0, 0.0
            # first event of the batch opens the session below
        for t, v in zip(ts, vals):
            if n > 0 and t - last > gap_s * 1_000_000:
                closed.append((user, start, last, n, sv))
                start, n, sv = t, 0, 0.0
            n += 1
            sv += float(v)
            last = t
        timeout_ms = int(last) // 1000 + gap_s * 1000
        if timeout_ms <= state.getCurrentWatermarkMs():
            # the watermark already guarantees no more members: close now
            # (setTimeoutTimestamp would reject a timestamp <= watermark)
            closed.append((user, start, last, n, sv))
            state.remove()
        else:
            state.update((int(start), int(last), int(n), float(sv)))
            state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield _pd.DataFrame({
                "user_id": [c[0] for c in closed],
                "session_start": [_pd.Timestamp(c[1], unit="us") for c in closed],
                "session_end": [_pd.Timestamp(c[2], unit="us") for c in closed],
                "n_events": [c[3] for c in closed],
                "sum_value": [c[4] for c in closed]})
    return fn


def sessionize_stream(events: DataFrame, gap_s: int = GAP_SECONDS,
                      watermark: str = "1 hour") -> DataFrame:
    """Streaming gap sessionization: ``applyInPandasWithState`` keyed by
    user, event-time timeout at ``last_event + gap`` (sessions close when
    the watermark guarantees no more members can arrive)."""
    src = events.withColumn("ts", F.col("ts").cast("timestamp")) \
                .withWatermark("ts", watermark)
    return (src.groupBy("user_id")
               .applyInPandasWithState(_session_fn(gap_s), _SESSION_OUT,
                                       _SESSION_STATE, "append",
                                       GroupStateTimeout.EventTimeTimeout))
