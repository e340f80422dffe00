"""Keyspace CRUD + TTL partition-drop maintenance (SURVEY.md §1.1)."""

from __future__ import annotations

from datetime import date

import pyspark.sql.functions as F
import pytest

from mycenae_spark.keyspace import Keyspace, KeyspaceManager
from mycenae_spark.sources.tables import events_as_points

from tests.conftest import SF_DIR


def test_crud(tmp_path):
    km = KeyspaceManager(str(tmp_path))
    km.create(Keyspace("ks1", ttl_days=30))
    km.create(Keyspace("ks2", ttl_days=7))
    assert km.list() == ["ks1", "ks2"]
    assert km.get("ks1").ttl_days == 30
    km.update_ttl("ks1", 60)
    assert km.get("ks1").ttl_days == 60
    with pytest.raises(ValueError):
        km.create(Keyspace("ks1"))
    km.drop("ks2")
    assert km.list() == ["ks1"]
    with pytest.raises(KeyError):
        km.get("ks2")


def test_ttl_partition_drop(spark, tmp_path):
    lake = str(tmp_path / "lake")
    pts = (
        events_as_points(spark, SF_DIR)
        .withColumn("ksid", F.lit("ks1"))
        .withColumn("date", F.to_date("ts"))
    )
    pts.write.partitionBy("ksid", "date").parquet(lake)
    km = KeyspaceManager(lake)
    km.create(Keyspace("ks1", ttl_days=10))

    before = spark.read.parquet(lake).count()
    # events span 2024-01-01..30; TTL=10d from 2024-01-25 keeps >= 01-15
    dropped = km.apply_ttl("ks1", today=date(2024, 1, 25))
    assert dropped and all("date=2024-01-0" in p or "date=2024-01-1" in p for p in dropped)

    remaining = spark.read.parquet(lake)
    assert remaining.count() < before
    assert remaining.select(F.min(F.col("date"))).collect()[0][0] >= date(2024, 1, 15)
    # idempotent
    assert km.apply_ttl("ks1", today=date(2024, 1, 25)) == []


def test_drop_keyspace_removes_data(spark, tmp_path):
    lake = str(tmp_path / "lake")
    pts = events_as_points(spark, SF_DIR).limit(100).withColumn(
        "ksid", F.lit("ksx")
    ).withColumn("date", F.to_date("ts"))
    pts.write.partitionBy("ksid", "date").parquet(lake)
    km = KeyspaceManager(lake)
    km.create(Keyspace("ksx", ttl_days=1))
    km.drop("ksx")
    import os

    assert not os.path.exists(f"{lake}/ksid=ksx")


def test_compaction(spark, tmp_path):
    from mycenae_spark.maintenance import compact_keyspace, compact_partition

    lake = str(tmp_path / "lake")
    pts = (
        events_as_points(spark, SF_DIR)
        .filter(F.to_date("ts") == "2024-01-05")
        .withColumn("ksid", F.lit("ks1"))
        .withColumn("date", F.to_date("ts"))
    )
    # simulate many micro-batch appends → many small files
    for _ in range(5):
        pts.repartition(3).write.mode("append").partitionBy("ksid", "date").parquet(lake)
    before_rows = spark.read.parquet(lake).count()

    nb, na = compact_partition(spark, lake, "ks1", "2024-01-05")
    assert nb >= 15 and na == 1
    after = spark.read.parquet(lake)
    assert after.count() == before_rows  # lossless
    # second pass is a no-op under the min_files gate
    assert compact_keyspace(spark, lake, "ks1", min_files=4) == {}


def test_ttl_drop_retains_partition_for_pinned_readers(spark, tmp_path):
    """TTL drops move expired partitions into _retained/<seq>/ instead of
    deleting: head snapshots and directory reads no longer see them, but a
    snapshot pinned before the drop still resolves the rows."""
    import datetime
    import json

    from mycenae_spark.keyspace import Keyspace, KeyspaceManager
    from mycenae_spark.streaming import snapshot
    from mycenae_spark.streaming.ingest import (
        decode_json_lines,
        prepare_points,
        write_points_batch,
    )

    lake, catalog = str(tmp_path / "lake"), str(tmp_path / "catalog")
    for b, (day_ms, metric) in enumerate(
        [(1704067200000, "old.m"), (1706745600000, "new.m")]
    ):
        rows = [
            (json.dumps({
                "metric": metric,
                "tags": {"ksid": "k1", "host": f"h{i}"},
                "timestamp": day_ms + i * 1000,
                "value": 1.0,
            }),)
            for i in range(5)
        ]
        valid, _ = prepare_points(
            decode_json_lines(spark.createDataFrame(rows, ["value"]))
        )
        write_points_batch(valid, lake, catalog, batch_id=f"t{b}")
    pre = snapshot.write_checkpoint(lake, catalog)

    mgr = KeyspaceManager(lake)
    mgr.create(Keyspace(name="k1", ttl_days=30))
    dropped = mgr.apply_ttl("k1", today=datetime.date(2024, 2, 10))
    assert len(dropped) == 1

    assert spark.read.parquet(lake).count() == 5  # directory: gone
    assert snapshot.read_points_snapshot(spark, lake).count() == 5
    pinned = snapshot.read_points_snapshot(spark, lake, as_of=pre)
    assert pinned.count() == 10  # grace window: still resolvable
    assert {r["metric"] for r in pinned.select("metric").distinct().collect()} \
        == {"old.m", "new.m"}
