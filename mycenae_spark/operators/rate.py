"""Rate / counter-rate (SURVEY.md §2.4 W5–W6).

Reference semantics (upstream ``lib/plot`` rate math, OpenTSDB contract):
per-series first derivative ``(v_t − v_{t−1}) / Δt_seconds``; in counter mode
a negative delta means the counter wrapped — add ``counterMax`` when
configured — and a result exceeding ``resetValue`` (>0) is emitted as 0.

Spark mapping: ``lag`` over ``Window.partitionBy(series).orderBy(ts)``.
One shuffle on the series key; within a partition the window is a single
sorted pass — the reference's per-series loop, minus the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def rate(
    df: DataFrame,
    series_cols: list[str],
    value_col: str = "value",
    ts_us_col: str = "ts_us",
    out_col: str = "value",
    counter: bool = False,
    counter_max: float | None = None,
    reset_value: float | None = None,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """First derivative per series; first point of each series is dropped
    (it has no predecessor — reference emits N−1 rates for N points).

    ``order_cols`` adds deterministic tie-breaks after the timestamp (used
    when duplicate timestamps within a series are possible)."""
    w = Window.partitionBy(*series_cols).orderBy(*(order_cols or [ts_us_col]))
    prev_v = F.lag(value_col).over(w)
    prev_ts = F.lag(ts_us_col).over(w)
    delta = F.col(value_col) - prev_v
    dt_s = (F.col(ts_us_col) - prev_ts) / F.lit(1_000_000.0)

    if counter:
        # Wrap handling before division, reset check after (W6 order).
        if counter_max is not None:
            delta = F.when(delta < 0, delta + F.lit(float(counter_max))).otherwise(delta)
        else:
            delta = F.when(delta < 0, F.lit(0.0)).otherwise(delta)
        r = delta / dt_s
        if reset_value is not None and reset_value > 0:
            r = F.when(r > F.lit(float(reset_value)), F.lit(0.0)).otherwise(r)
    else:
        r = delta / dt_s

    return (
        df.withColumn("_prev_ts", prev_ts)
        .withColumn(out_col, r)
        .filter(F.col("_prev_ts").isNotNull())
        .drop("_prev_ts")
    )
