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


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """SCALING §4: pre-bucketing both sides of a recurring join key removes
    the per-query shuffle entirely (SortMergeJoin with no Exchange)."""
    import shutil

    ev = events_as_points(spark, SF_DIR)
    agg_a = ev.groupBy("tag_user").agg(F.sum("value").alias("sv"))
    agg_b = ev.groupBy("tag_user").agg(F.count(F.lit(1)).alias("n"))
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
    try:
        agg_a.write.bucketBy(8, "tag_user").sortBy("tag_user").saveAsTable("bkt_a")
        agg_b.write.bucketBy(8, "tag_user").sortBy("tag_user").saveAsTable("bkt_b")
        # hint forces SortMergeJoin (tiny test tables would broadcast and the
        # planner then skips bucketed reads); at real scale SMJ is the
        # default and bucketing removes its shuffle.
        joined = spark.table("bkt_a").hint("merge").join(
            spark.table("bkt_b"), "tag_user"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == agg_a.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
        shutil.rmtree("spark-warehouse", ignore_errors=True)
