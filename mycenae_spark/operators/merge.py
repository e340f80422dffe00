"""Series merge — the OpenTSDB "aggregator" (SURVEY.md §2.3).

Reference semantics (upstream ``lib/plot`` merge math): group the resolved
series by the requested groupBy tags; within each group, align points on
timestamp and apply the aggregator across series at each timestamp; tag keys
grouped away are reported as ``aggregateTags``.

In Spark the whole align-and-aggregate machinery collapses into one hash
aggregation ``groupBy(group_cols + [time]).agg(...)`` with automatic
partial (map-side) aggregation — no alignment code at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

#: OpenTSDB aggregator → Spark expression.  The five mycenae core ones plus
#: the wider OpenTSDB set, each a one-liner (SURVEY.md §2.3 note).
AGGREGATORS: dict[str, callable] = {
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "dev": F.stddev_samp,
    "zimsum": F.sum,  # zero-if-missing sum == sum under hash-agg alignment
    "mimmin": F.min,
    "mimmax": F.max,
    "p50": lambda c: F.percentile_approx(c, 0.5),
    "p90": lambda c: F.percentile_approx(c, 0.9),
    "p95": lambda c: F.percentile_approx(c, 0.95),
    "p99": lambda c: F.percentile_approx(c, 0.99),
}


def agg_expr(name: str, col: str | Column = "value") -> Column:
    if name not in AGGREGATORS:
        raise ValueError(f"unknown aggregator: {name!r}")
    return AGGREGATORS[name](F.col(col) if isinstance(col, str) else col)


def merge(
    df: DataFrame,
    aggregator: str,
    group_cols: list[str],
    time_col: str = "bucket_ms",
    value_col: str = "value",
    out_col: str = "value",
) -> DataFrame:
    """Merge series: one row per (group, time) with the aggregated value."""
    return df.groupBy(*group_cols, time_col).agg(
        agg_expr(aggregator, value_col).alias(out_col)
    )
