"""Downsample + fill policies (SURVEY.md §2.4 W1–W4) — the TSDB core.

Reference semantics (upstream ``lib/plot`` downsample math): per-series
tumbling buckets ``<interval>-<agg>[-<fill>]``; agg ∈ {avg,sum,min,max,count,
first,last}; fill ∈ {none,null,nan,zero}.  The reference loops per series
over in-memory point arrays; in Spark the whole machinery is one hash
aggregation on (series, bucket) — partial aggregation map-side, so the
shuffle carries pre-combined buckets, not raw points.  That is the property
that survives a 100 TB scan: shuffle volume ∝ #buckets, not #points.

Buckets are epoch-aligned (floor of epoch time to the interval) and carried
as BIGINT epoch-milliseconds — mycenae's native unit, and an arithmetic
representation identical across engines (no timezone/units ambiguity in the
correctness oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

#: Downsample aggregator name → column expression (SURVEY.md §2.4 W1).
DOWNSAMPLE_AGGS = {
    "avg": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "first": lambda c: F.first(c, ignorenulls=True),
    "last": lambda c: F.last(c, ignorenulls=True),
    # OpenTSDB pNN downsampler family.  Exact interpolated percentile so the
    # result is oracle-checkable (DuckDB quantile_cont); `percentile` is a
    # hash-aggregate (sorts only within each (series, bucket) group — bounded
    # by points-per-bucket, never a global sort).  At 100 TB swap for
    # `percentile_approx` (mergeable single-pass sketch) when ±ε is fine.
    "p50": lambda c: F.percentile(c, F.lit(0.5)),
    "p90": lambda c: F.percentile(c, F.lit(0.9)),
    "p95": lambda c: F.percentile(c, F.lit(0.95)),
    "p99": lambda c: F.percentile(c, F.lit(0.99)),
}

FILL_POLICIES = ("none", "null", "nan", "zero")


def bucket_ms_long(ts_us: Column, interval_ms: int) -> Column:
    """Epoch-aligned tumbling bucket start (BIGINT ms) from a µs column.

    Pure integer arithmetic (`x - x % iv`) so the result is bit-identical to
    the DuckDB oracle's ``(epoch_us(ts) // iv_us) * iv_ms`` — no float floor.
    """
    iv_us = interval_ms * 1000
    start_us = ts_us - (ts_us % F.lit(iv_us))
    return (start_us / F.lit(1000)).cast("long")


def downsample(
    df: DataFrame,
    series_cols: list[str],
    interval_ms: int,
    agg: str,
    value_col: str = "value",
    ts_us_col: str = "ts_us",
    out_col: str = "value",
    fill: str = "none",
) -> DataFrame:
    """Per-series tumbling-bucket aggregation with a fill policy.

    Returns ``series_cols + [bucket_ms, out_col]``.  With ``fill != 'none'``
    empty buckets inside each series' own [min,max] bucket extent are emitted
    (SURVEY.md §7.2 M2 decision: per-series extent) as null / NaN / 0.
    """
    if agg not in DOWNSAMPLE_AGGS:
        raise ValueError(f"unknown downsample agg: {agg!r}")
    if fill not in FILL_POLICIES:
        raise ValueError(f"unknown fill policy: {fill!r}")

    b = bucket_ms_long(F.col(ts_us_col), interval_ms)
    agged = (
        df.withColumn("bucket_ms", b)
        .groupBy(*series_cols, "bucket_ms")
        .agg(DOWNSAMPLE_AGGS[agg](F.col(value_col)).alias(out_col))
    )
    if fill == "none":
        return agged
    return _fill(agged, series_cols, interval_ms, out_col, fill)


def _fill(
    agged: DataFrame, series_cols: list[str], interval_ms: int, out_col: str, fill: str
) -> DataFrame:
    """Left-join each series onto its own dense bucket spine.

    The spine is ``sequence(min_bucket, max_bucket, interval)`` exploded —
    generated per series from the (already tiny) aggregated frame, so its
    cost is ∝ #buckets.  The join key (series, bucket) is co-partitioned with
    the aggregation output; AQE turns it into a local join after the same
    shuffle at scale.
    """
    spine = (
        agged.groupBy(*series_cols)
        .agg(F.min("bucket_ms").alias("_lo"), F.max("bucket_ms").alias("_hi"))
        .select(
            *series_cols,
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"), F.lit(interval_ms))).alias(
                "bucket_ms"
            ),
        )
    )
    joined = spine.join(agged, [*series_cols, "bucket_ms"], "left")
    if fill == "zero":
        return joined.withColumn(out_col, F.coalesce(F.col(out_col), F.lit(0.0)))
    # fill in ("null", "nan"): empty buckets stay NULL internally.  OpenTSDB
    # NaN-fill semantics skip NaN buckets in downstream aggregation, which is
    # exactly what NULL gives Spark's sum/avg for free; a literal NaN here
    # would instead poison every merged group containing a missing bucket.
    # NaN is rendered only at the JSON edge (shape_response nan_fill).
    return joined


def fill_linear(
    agged: DataFrame,
    series_cols: list[str],
    interval_ms: int,
    value_col: str = "value",
) -> DataFrame:
    """Linear-interpolation fill over a dense spine (beyond-reference
    extension; the SURVEY §2.11 U5 'exotic interpolation' example done as
    pure window composition — no pandas needed, so it stays codegen'd and
    oracle-checkable).

    Empty buckets between two observed buckets get the time-weighted
    interpolation; leading/trailing gaps stay null (no extrapolation).
    Cost: the spine join + two window passes over #buckets rows.
    """
    from pyspark.sql import Window

    dense = _fill(agged, series_cols, interval_ms, value_col, "null")
    w_past = (
        Window.partitionBy(*series_cols)
        .orderBy("bucket_ms")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_future = (
        Window.partitionBy(*series_cols)
        .orderBy("bucket_ms")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    v = F.col(value_col)
    obs_bucket = F.when(v.isNotNull(), F.col("bucket_ms"))
    prev_v = F.last(v, ignorenulls=True).over(w_past)
    prev_b = F.last(obs_bucket, ignorenulls=True).over(w_past)
    next_v = F.first(v, ignorenulls=True).over(w_future)
    next_b = F.first(obs_bucket, ignorenulls=True).over(w_future)
    lerp = prev_v + (next_v - prev_v) * (
        (F.col("bucket_ms") - prev_b) / (next_b - prev_b)
    )
    filled = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNotNull() & next_v.isNotNull(), lerp)
        .otherwise(F.lit(None))
    )
    return dense.withColumn(value_col, filled)
