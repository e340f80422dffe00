"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The implementation lives in the ``mycenae_spark`` package (SURVEY.md §7);
this module is a thin adapter.  Queries without an oracle entry
(approximate/statistical by construction) get the driver's rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mycenae_spark.registry import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (SURVEY.md §7.1 slice):
    events-as-points → time-range filter → per-series 1h-avg downsample →
    cross-series sum merge per metric, ordered by (metric, bucket)."""
    import pyspark.sql.functions as F

    from mycenae_spark.operators.downsample import downsample
    from mycenae_spark.operators.filters import time_range
    from mycenae_spark.operators.merge import merge
    from mycenae_spark.sources.tables import events_as_points

    p = events_as_points(spark, "/root/testdata/sf0.001")
    p = p.filter(
        time_range(F.col("ts_us"), 1704067200000000, 1706745600000000)
    )
    ds = downsample(p, ["metric", "tag_user"], 3_600_000, "avg", out_col="avg_v")
    out = merge(ds, "sum", ["metric"], time_col="bucket_ms", value_col="avg_v")
    return out.orderBy("metric", "bucket_ms")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted ⇒ rows-only check)."""
    return dict(ORACLE)
