"""Maintenance-job tests: staging GC (compaction is covered in
test_keyspace.py / test_operators_units.py)."""

from __future__ import annotations


def test_gc_staging_removes_only_orphans(spark, tmp_path):
    """Age-based staging GC: uncommitted old dirs go, committed (pending
    moves) and fresh dirs stay."""
    import os
    import time

    from mycenae_spark.maintenance import gc_staging

    lake = tmp_path / "lake"
    old_orphan = lake / "_staging" / "7" / "points"
    committed = lake / "_staging" / "8" / "points"
    fresh = lake / "_staging" / "9" / "points"
    for d in (old_orphan, committed, fresh):
        d.mkdir(parents=True)
        (d / "part-x.parquet").write_bytes(b"x")
    (lake / "_commits").mkdir()
    (lake / "_commits" / "8").write_text('{"points": []}')
    ancient = time.time() - 48 * 3600
    os.utime(old_orphan.parent, (ancient, ancient))

    removed = gc_staging(str(lake), max_age_s=24 * 3600)
    assert removed == ["7"]
    assert not old_orphan.parent.exists()
    assert committed.exists() and fresh.exists()


def test_dedupe_catalog(spark, tmp_path):
    """Concurrent writers that both cataloged the same new series leave
    duplicate rows; the maintenance sweep keeps one per tsid and is a no-op
    when the catalog is already clean."""
    import json

    from mycenae_spark.maintenance import dedupe_catalog
    from mycenae_spark.streaming.ingest import (
        decode_json_lines,
        prepare_points,
        write_points_batch,
    )

    lake, catalog = str(tmp_path / "lake"), str(tmp_path / "catalog")
    pts = [{"metric": "dup.m", "tags": {"ksid": "k1", "h": "a"},
            "timestamp": 1704067200000, "value": 1.0}]
    raw = spark.createDataFrame([(json.dumps(p),) for p in pts], ["value"])
    valid, _ = prepare_points(decode_json_lines(raw))
    write_points_batch(valid, lake, catalog, batch_id="a-0")
    # second writer raced the first: same series appended again, bypassing
    # the anti-join (simulates both reading the pre-batch catalog)
    valid.select("ksid", "tsid", "metric", "tags").dropDuplicates(
        ["tsid"]
    ).write.mode("append").parquet(catalog)
    assert spark.read.parquet(catalog).count() == 2

    out = dedupe_catalog(spark, lake, catalog)
    assert out == {"removed": 1, "remaining": 1}
    assert spark.read.parquet(catalog).count() == 1
    assert dedupe_catalog(spark, lake, catalog) == {"removed": 0, "remaining": 1}


def test_catalog_swap_salvages_racing_append(spark, tmp_path):
    """An append whose part files land in the catalog between the rewrite's
    CAS and the directory swap must survive: the swap moves any
    not-in-snapshot file into the new directory before dropping the old."""
    import json

    from mycenae_spark.maintenance import swap_catalog_dir
    from mycenae_spark.streaming.ingest import (
        decode_json_lines,
        prepare_points,
        write_points_batch,
    )

    lake, catalog = str(tmp_path / "lake"), str(tmp_path / "catalog")

    def valid_of(metric):
        pts = [{"metric": metric, "tags": {"ksid": "k1"},
                "timestamp": 1704067200000, "value": 1.0}]
        raw = spark.createDataFrame([(json.dumps(p),) for p in pts], ["value"])
        v, _ = prepare_points(decode_json_lines(raw))
        return v

    write_points_batch(valid_of("keep.me"), lake, catalog, batch_id="w-0")
    cat = spark.read.parquet(catalog)
    snapshot = set(cat.inputFiles())

    # rewrite: survivors staged to tmp
    import os
    tmp = str(tmp_path / "cat_tmp")
    cat.write.parquet(tmp)

    # ...meanwhile a racing append lands AFTER the snapshot listing
    write_points_batch(valid_of("late.series"), lake, catalog, batch_id="w-1")

    salvaged = swap_catalog_dir(catalog, tmp, snapshot)
    assert salvaged >= 1
    metrics = {r["metric"] for r in spark.read.parquet(catalog).collect()}
    assert metrics == {"keep.me", "late.series"}


def test_gc_commit_markers(spark, tmp_path):
    """Old markers with completed moves are swept; young markers and
    markers with pending staged moves survive."""
    import json
    import os

    from mycenae_spark.maintenance import gc_commit_markers
    from mycenae_spark.streaming.ingest import (
        decode_json_lines,
        prepare_points,
        write_points_batch,
    )

    lake, catalog = str(tmp_path / "lake"), str(tmp_path / "catalog")
    pts = [{"metric": "gc.m", "tags": {"ksid": "k1"},
            "timestamp": 1704067200000, "value": 1.0}]
    raw = spark.createDataFrame([(json.dumps(p),) for p in pts], ["value"])
    valid, _ = prepare_points(decode_json_lines(raw))
    write_points_batch(valid, lake, catalog, batch_id="old-done")
    write_points_batch(valid, lake, catalog, batch_id="young-done")
    # age the first marker; give the second a fake pending staging dir
    old_marker = os.path.join(lake, "_commits", "old-done")
    os.utime(old_marker, (1, 1))
    write_points_batch(valid, lake, catalog, batch_id="old-pending")
    pend_marker = os.path.join(lake, "_commits", "old-pending")
    os.utime(pend_marker, (1, 1))
    os.makedirs(os.path.join(lake, "_staging", "old-pending"))

    assert gc_commit_markers(lake) == ["old-done"]
    left = set(os.listdir(os.path.join(lake, "_commits")))
    assert left == {"young-done", "old-pending"}


def _ingest_batches(spark, lake, catalog, n_batches=2, per=6, metric="ret.m"):
    import json

    from mycenae_spark.streaming.ingest import (
        decode_json_lines,
        prepare_points,
        write_points_batch,
    )

    for b in range(n_batches):
        rows = [
            (json.dumps({
                "metric": metric,
                "tags": {"ksid": "k1", "host": f"h{b}-{i}"},
                "timestamp": 1704067200000 + (b * per + i) * 60_000,
                "value": 1.0,
            }),)
            for i in range(per)
        ]
        valid, _ = prepare_points(
            decode_json_lines(spark.createDataFrame(rows, ["value"]))
        )
        write_points_batch(valid, lake, catalog, batch_id=f"r{b}")


def test_compaction_retains_superseded_generation(spark, tmp_path):
    """Time travel across a compaction: the pre-compaction snapshot still
    reads (its files moved to _retained/<seq>/, not deleted), the head
    snapshot serves the compacted files, and gc_retained reclaims the
    grace window by age — after which the pinned read fails loudly."""
    import os
    import time

    import pytest as _pytest

    from mycenae_spark.maintenance import compact_partition, gc_retained
    from mycenae_spark.streaming import snapshot

    lake, catalog = str(tmp_path / "lake"), str(tmp_path / "catalog")
    _ingest_batches(spark, lake, catalog)
    pre = snapshot.write_checkpoint(lake, catalog)
    n_files_pre = len(snapshot.resolve(lake)["points"])
    assert n_files_pre >= 2

    date = os.listdir(os.path.join(lake, "ksid=k1"))[0].split("=", 1)[1]
    compact_partition(spark, lake, "k1", date)

    # head: compacted view, same rows
    assert snapshot.read_points_snapshot(spark, lake).count() == 12
    assert len(snapshot.resolve(lake)["points"]) < n_files_pre
    # pinned pre-compaction: old generation resolves from _retained
    pinned = snapshot.read_points_snapshot(spark, lake, as_of=pre)
    assert pinned.count() == 12
    assert any("_retained" in f for f in pinned.inputFiles())

    # VACUUM: age out the retained generation → pinned read fails loudly
    ret_root = os.path.join(lake, "_retained")
    for gen in os.listdir(ret_root):
        ancient = time.time() - 8 * 24 * 3600
        os.utime(os.path.join(ret_root, gen), (ancient, ancient))
    removed = gc_retained(lake)
    assert removed
    snapshot._RESOLVE_MEMO.clear()
    with _pytest.raises(snapshot.TransientInFlight):
        snapshot.read_points_snapshot(spark, lake, as_of=pre).count()


def test_catalog_dedupe_retains_superseded_generation(spark, tmp_path):
    """Catalog rewrites keep the old generation for pinned readers."""
    import json

    from mycenae_spark.maintenance import dedupe_catalog
    from mycenae_spark.streaming import snapshot
    from mycenae_spark.streaming.ingest import (
        decode_json_lines,
        prepare_points,
        write_points_batch,
    )

    lake, catalog = str(tmp_path / "lake"), str(tmp_path / "catalog")
    pts = [{"metric": "dup.m", "tags": {"ksid": "k1", "h": "a"},
            "timestamp": 1704067200000, "value": 1.0}]
    raw = spark.createDataFrame([(json.dumps(p),) for p in pts], ["value"])
    valid, _ = prepare_points(decode_json_lines(raw))
    write_points_batch(valid, lake, catalog, batch_id="a-0")
    valid.select("ksid", "tsid", "metric", "tags").dropDuplicates(
        ["tsid"]
    ).write.mode("append").parquet(catalog)
    pre = snapshot.write_checkpoint(lake, catalog)

    assert dedupe_catalog(spark, lake, catalog)["removed"] == 1
    # head sees the deduped catalog; pinned still sees both rows
    assert snapshot.read_catalog_snapshot(spark, lake, catalog).count() == 1
    assert snapshot.read_catalog_snapshot(
        spark, lake, catalog, as_of=pre
    ).count() == 2
