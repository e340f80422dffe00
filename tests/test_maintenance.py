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
