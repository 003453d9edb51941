"""Temporal joins Spark lacks natively — the as-of join.

An as-of join attaches, to every left row, the LATEST right row with
``ts_right <= ts_left`` per key (market-data, sensor-alignment, and
feature-store point-in-time-correctness semantics).  Spark has no ASOF
JOIN operator; the naive theta-join (``l.ts >= r.ts`` + window) explodes
quadratically per key.  The scale-right form used here is the classic
UNION + ORDERED WINDOW trick:

1. tag both sides, union them (allowMissingColumns),
2. one window per key ordered by (ts, side, right-order) with
   ``last(..., ignorenulls=True)`` carrying the most recent right values
   forward,
3. keep only left rows.

Cost: ONE shuffle of |L|+|R| rows keyed by the join key — linear, no
per-key cross product, AQE-skew-splittable like any window.  Ties
(right.ts == left.ts) match (<= semantics, right sorts first); multiple
right rows at the same ts resolve to the greatest ``order_col`` —
explicit and deterministic, where engines with native ASOF leave it
unspecified.  The DuckDB oracle uses its NATIVE ``ASOF JOIN`` operator —
two independent implementations agreeing on the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key_cols,
              ts_col: str = "ts", value_cols=("value",),
              order_col: str | None = None,
              suffix: str = "_asof") -> DataFrame:
    """Left as-of join: every ``left`` row gains ``<v>{suffix}`` columns
    holding the latest ``right`` values at-or-before its timestamp
    (null when no prior right row exists), plus ``ts{suffix}`` — the
    matched right timestamp.

    ``order_col``: tie-break among right rows sharing (key, ts) — the
    greatest value wins; defaults to the first value column.
    """
    key_cols = list(key_cols)
    order_col = order_col or value_cols[0]
    value_cols = list(value_cols)
    r = (right.select(*key_cols, ts_col, *dict.fromkeys(value_cols + [order_col]))
              .withColumn("_side", F.lit(0)))
    l = left.withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows sort BEFORE left rows at the same ts (<= semantics) and
    # among themselves by order_col, so `last` sees the winner last
    w = (Window.partitionBy(*key_cols)
               .orderBy(F.col(ts_col).asc(), F.col("_side").asc(),
                        F.col(order_col).asc_nulls_first())
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = u
    for v in value_cols:
        out = out.withColumn(
            f"{v}{suffix}",
            F.last(F.when(F.col("_side") == 0, F.col(v)), ignorenulls=True).over(w))
    out = out.withColumn(
        f"{ts_col}{suffix}",
        F.last(F.when(F.col("_side") == 0, F.col(ts_col)), ignorenulls=True).over(w))
    keep = left.columns + [f"{v}{suffix}" for v in value_cols] + [f"{ts_col}{suffix}"]
    return out.filter(F.col("_side") == 1).select(*keep)
