"""Lake layout claims from SCALING.md §1, demonstrated: (ksid, date)
partitioning gives partition pruning for time-ranged queries, and the
catalog semi-join plan broadcasts."""

from __future__ import annotations

import pyspark.sql.functions as F

from mycenae_spark.sources.tables import events_as_points

from tests.conftest import SF_DIR


def _build_lake(spark, tmp_path):
    pts = events_as_points(spark, SF_DIR).withColumn(
        "date", F.to_date("ts")
    ).withColumn("ksid", F.lit("ks1"))
    lake = str(tmp_path / "lake")
    (
        pts.repartition("date")
        .sortWithinPartitions("metric", "tag_user", "ts")
        .write.partitionBy("ksid", "date")
        .parquet(lake)
    )
    return lake


def test_time_range_prunes_partitions(spark, tmp_path):
    lake = _build_lake(spark, tmp_path)
    df = spark.read.parquet(lake).filter(
        (F.col("date") >= "2024-01-10") & (F.col("date") < "2024-01-12")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # pruned scan reads only the 2 matching date dirs
    n_days = df.select("date").distinct().count()
    assert n_days == 2
    total_days = spark.read.parquet(lake).select("date").distinct().count()
    assert total_days > 2  # the data really spans more days


def test_catalog_semi_join_broadcasts(spark, tmp_path):
    lake = _build_lake(spark, tmp_path)
    pts = spark.read.parquet(lake)
    catalog = pts.select("metric", "tag_user").distinct().filter(
        F.col("tag_user") < 5
    )
    resolved = pts.join(F.broadcast(catalog), ["metric", "tag_user"], "left_semi")
    plan = resolved._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert resolved.count() > 0
