"""Per-series gap / heartbeat statistics — ONE kernel shared by the
judged registry op (``series_gaps``) and the served endpoint
(``server.py::query_gaps``), the same division the funnel/retention
operators use: semantics live here once, callers pick the series key.

Plan shape: the lag window and the per-series aggregate share ONE
exchange on the key columns (the window's partitioning IS the grouping,
so Catalyst reuses the sort) — `rate`'s exact cost envelope; output is
#series rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def series_gap_stats(
    df: DataFrame,
    key_cols: list[str],
    threshold_us: int,
    ts_col: str = "ts_us",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """One row per series (``key_cols``): point count, largest silent
    window, count of gaps strictly over ``threshold_us``, and the mean
    inter-point interval as integer-floored microseconds — exact BIGINT
    arithmetic on any engine (a float mean at 1e11 µs magnitudes sits at
    double's 4-decimal representability edge; a rounding half-case
    measurably flipped between engines).  A single-point series reports
    max_gap_us = mean_gap_us = −1: no interval exists, and 0 would alias
    "perfectly dense".

    ``order_cols`` appends deterministic tie-breaks after the timestamp
    (pass the point id when duplicate timestamps are possible, so both
    engines lag over the identical order)."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *(order_cols or []))
    g = df.select(
        *key_cols, ts_col,
        (F.col(ts_col) - F.lag(ts_col).over(w)).alias("gap"),
    )
    n = F.count(F.lit(1))
    return g.groupBy(*key_cols).agg(
        n.alias("n_points"),
        F.coalesce(F.max("gap"), F.lit(-1)).alias("max_gap_us"),
        F.sum(
            F.when(F.col("gap") > threshold_us, 1).otherwise(0)
        ).alias("n_large_gaps"),
        F.when(
            n > 1,
            F.floor((F.max(ts_col) - F.min(ts_col)) / (n - 1)),
        ).otherwise(F.lit(-1)).cast("long").alias("mean_gap_us"),
    )
