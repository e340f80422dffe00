"""Conventions shared by all registry queries.

Cross-engine determinism rules (see tests/test_oracle.py for the local
replica of the driver's check):

* **Floats** that result from aggregation are rounded to 4 decimals on both
  sides (``r4``); derivative-style small values to 6 (``r6``).  Spark and
  DuckDB both round half-away-from-zero for positive doubles (verified).
* **Time** is never emitted as a raw TIMESTAMP: buckets are BIGINT epoch ms
  (integer arithmetic identical in both engines, no tz/unit ambiguity);
  instants are BIGINT epoch µs.
* Every computed column is aliased; the driver sorts columns by name.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F

from mycenae_spark.sources.tables import events_as_points, load_table

US_PER_MS = 1000
MS_2024_01_05 = 1704412800000
MS_2024_01_12 = 1705017600000


# Rounding stabilizer: quantized source data makes exact half-way ties at
# the rounding boundary COMMON (e.g. avg of 2-decimal values = 38.37875);
# sub-ulp fp noise then makes engines disagree on the direction.  Shifting
# by EPS (≫ cross-engine noise ~1e-13, ≪ boundary spacing 5e-5) resolves
# every tie identically on both sides.  Oracle SQL uses the same shift.
EPS = 1e-9


def rN(c: Column, d: int) -> Column:
    return F.round(c + F.lit(EPS), d)


def r4(c: Column) -> Column:
    return F.round(c + F.lit(EPS), 4)


def r6(c: Column) -> Column:
    return F.round(c + F.lit(EPS), 6)


def points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_as_points(spark, sf_dir)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


#: DuckDB fragment: events viewed as points (metric/tag_user/ts_us/value),
#: mirroring sources/tables.py::events_as_points.
SQL_POINTS = (
    "SELECT event_type AS metric, user_id AS tag_user, epoch_us(ts) AS ts_us, "
    "value, event_id, props FROM events"
)


def bucket_ms_sql(iv_ms: int, ts_expr: str = "ts_us") -> str:
    """DuckDB epoch-aligned bucket start in ms — mirrors
    operators/downsample.py::bucket_ms_long bit-for-bit."""
    return f"(({ts_expr}) // {iv_ms * 1000}) * {iv_ms}"
