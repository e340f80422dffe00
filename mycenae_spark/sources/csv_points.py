"""CSV point source (beyond-reference convenience format).

Layout: ``metric,timestamp,value,tags`` where ``tags`` is a
``k=v;k=v`` list (CSV-safe — no commas).  Decodes to the POINT_SCHEMA
envelope with pure column expressions, batch or streaming (the same
expressions work under ``readStream``), feeding the same validation +
lake path as JSON/telnet ingest.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

CSV_SCHEMA = "metric STRING, timestamp LONG, value DOUBLE, tags STRING"


def decode_csv_points(df: DataFrame) -> DataFrame:
    """Typed CSV rows → point envelope (adds null ``text``)."""
    tag_entries = F.transform(
        F.split(F.coalesce(F.col("tags"), F.lit("")), ";"),
        lambda kv: F.struct(
            F.split_part(kv, F.lit("="), F.lit(1)).alias("key"),
            F.split_part(kv, F.lit("="), F.lit(2)).alias("value"),
        ),
    )
    return df.select(
        "metric",
        F.map_from_entries(
            F.filter(tag_entries, lambda e: e["key"] != "")
        ).alias("tags"),
        "timestamp",
        "value",
        F.lit(None).cast("string").alias("text"),
    )


def read_points_csv(spark: SparkSession, path: str, streaming: bool = False) -> DataFrame:
    reader = spark.readStream if streaming else spark.read
    raw = reader.schema(CSV_SCHEMA).csv(path)
    return decode_csv_points(raw)
