"""Lake maintenance: small-file compaction (SCALING.md §1 companion).

Streaming ingest writes one file set per micro-batch; at 100 TB/day that is
the classic small-files problem — NameNode/listing pressure and tiny
row-groups that defeat min/max skipping.  The fix is periodic per-partition
compaction: rewrite a (ksid, date) partition into ~target-sized files,
sorted by (tsid, ts) so per-series locality survives.

The rewrite is made atomic-enough for a filesystem lake: write to a temp
directory next to the partition, then swap via two renames.  (On an object
store one uses a table format's transaction — Delta/Iceberg — instead; the
job shape is identical.)

Retention (r7): destructive rewrites — compaction, catalog rewrite/dedupe,
TTL partition drops, rollup backfill — no longer delete the superseded
generation outright.  Superseded files move to
``<section_root>/_retained/<seq>/<rel_path>`` (the VACUUM-style grace
window): underscore-prefixed, so directory readers never double-count, while
log-gated snapshot reads pinned BEFORE the rewrite fall back to the retained
copy and keep working (streaming/snapshot.py).  ``gc_retained`` sweeps
generations by age, like every other GC here — until it runs, short-range
time travel survives any rewrite.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession

RETAINED_DIR = "_retained"

#: The marker replay window: a committed-batch marker younger than this
#: is still live replay-idempotence (and content-fingerprint) evidence —
#: sweeping it lets a lost-checkpoint replay silently re-land its batch.
#: THE one copy (r18 review): gc_commit_markers and gc_retained default
#: to it, and the ingest bridge's GC tail clamps its marker AND
#: grace-area sweeps to it.
REPLAY_WINDOW_S = 7 * 24 * 3600


def retain_path(section_root: str, seq: int, rel_path: str) -> str:
    """Destination for a superseded file retained at log position ``seq``."""
    return os.path.join(section_root, RETAINED_DIR, f"{seq:020d}", rel_path)


def retain_file(section_root: str, seq: int, rel_path: str, src: str) -> None:
    """Move a superseded data file into the retention area (grace window)."""
    dst = retain_path(section_root, seq, rel_path)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    shutil.move(src, dst)


def gc_retained(
    section_root: str, max_age_s: float = REPLAY_WINDOW_S
) -> list[str]:
    """Sweep retained generations older than ``max_age_s`` (the VACUUM).

    A ``_retained/<seq>`` generation is referenced only by snapshot reads
    pinned before log position seq; once the grace window passes, pinned
    readers that old are out of contract (same horizon discipline as
    ``gc_commitlog``) and the bytes are reclaimed.  Age uses the generation
    dir's mtime (stamped at the rewrite).  Returns the paths removed.
    """
    import time

    root = os.path.join(section_root, RETAINED_DIR)
    if not os.path.isdir(root):
        return []
    removed = []
    now = time.time()
    for name in sorted(os.listdir(root)):
        path = os.path.join(root, name)
        if not os.path.isdir(path):
            continue
        try:
            if now - os.path.getmtime(path) < max_age_s:
                continue
        except OSError:
            continue  # concurrently removed
        shutil.rmtree(path, ignore_errors=True)
        removed.append(path)
    return removed


def compact_partition(
    spark: SparkSession,
    lake_dir: str,
    ksid: str,
    date: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    retries: int = 5,
) -> tuple[int, int]:
    """Compact one (ksid, date) partition; returns (files_before, files_after).

    File count is chosen from actual partition bytes / target size, floor 1.

    Concurrency: the rewrite is a read-modify-write of the partition, so it
    is CAS-guarded on the commit log like the catalog rewrites — an append
    committing mid-rewrite forces a retry against fresh state, and the
    directory swap salvages part files from appends that land in the
    CAS-to-rename window (they belong to later log entries, so dropping
    them would violate the log order).  The log entry records the compacted
    file list so log-gated snapshot reads (streaming/snapshot.py) replace
    the partition's visible set at exactly this position.
    """
    from mycenae_spark.streaming import commitlog

    part = os.path.join(lake_dir, f"ksid={ksid}", f"date={date}")
    rel_part = os.path.join(f"ksid={ksid}", f"date={date}")
    if not os.path.isdir(part):
        raise FileNotFoundError(part)
    ksid_dir = os.path.dirname(part)

    for _ in range(retries):
        head = commitlog.latest_seq(lake_dir)
        data_files = [f for f in os.listdir(part) if f.endswith(".parquet")]
        total_bytes = sum(
            os.path.getsize(os.path.join(part, f)) for f in data_files
        )
        n_out = max(1, round(total_bytes / target_file_bytes))

        df = spark.read.parquet(part)
        # The authoritative input set is what the rewrite actually read —
        # a file landing between the os.listdir above and Spark's own
        # listing would otherwise be both compacted AND salvaged.
        input_names = {os.path.basename(p) for p in df.inputFiles()}
        # Underscore-prefixed siblings: Spark's file listing ignores paths
        # whose basename starts with `_`, and they don't match the `date=`
        # prefix — so a concurrent read of the lake root never sees the
        # in-flight rewrite as data or as a bogus partition value.
        tmp = os.path.join(ksid_dir, f"_compact_{uuid.uuid4().hex[:8]}")
        sort_cols = [c for c in ("tsid", "ts") if c in df.columns]
        writer = df.repartition(n_out)
        if sort_cols:
            writer = writer.sortWithinPartitions(*sort_cols)
        writer.write.mode("overwrite").parquet(tmp)

        new_files = sorted(
            f for f in os.listdir(tmp) if not f.startswith(("_", "."))
        )
        try:
            seq = commitlog.append(
                lake_dir,
                {
                    "kind": "compaction",
                    "partition": rel_part,
                    "files": [os.path.join(rel_part, f) for f in new_files],
                },
                expected_head=head,
            )
        except commitlog.CommitConflict:
            shutil.rmtree(tmp, ignore_errors=True)
            continue  # an append landed mid-rewrite — redo from fresh state
        old = os.path.join(ksid_dir, f"_old_{uuid.uuid4().hex[:8]}")
        os.rename(part, old)
        try:
            os.rename(tmp, part)
        except OSError:
            # An in-flight batch's file moves recreated `part` between the
            # two renames (ingest's _apply_moves makedirs the partition):
            # the whole-dir rename fails, so merge the compacted files into
            # the recreated dir file-by-file — part-file names are
            # uuid-unique, nothing collides, and the racing batch's files
            # stay in place (its manifest owns them).
            os.makedirs(part, exist_ok=True)
            for name in os.listdir(tmp):
                shutil.move(os.path.join(tmp, name), os.path.join(part, name))
            shutil.rmtree(tmp, ignore_errors=True)
        # Old dir triage: files not in the rewrite's input set belong to a
        # later commit — salvage them back (their manifests re-add them for
        # snapshot readers).  Input files are the superseded generation —
        # RETAIN them under _retained/<seq>/ so snapshot reads pinned
        # before this compaction keep resolving (grace window, not delete).
        for name in os.listdir(old):
            if name.startswith(("_", ".")):
                continue
            if name in input_names:
                retain_file(
                    lake_dir, seq, os.path.join(rel_part, name),
                    os.path.join(old, name),
                )
            else:
                shutil.move(os.path.join(old, name), os.path.join(part, name))
        shutil.rmtree(old)
        return len(data_files), n_out
    raise RuntimeError("compaction lost the commit-log race repeatedly")


def list_partitions(lake_dir: str, ksid: str) -> list[str]:
    root = os.path.join(lake_dir, f"ksid={ksid}")
    if not os.path.isdir(root):
        return []
    return sorted(
        e.split("=", 1)[1] for e in os.listdir(root) if e.startswith("date=")
    )


def compact_keyspace(
    spark: SparkSession,
    lake_dir: str,
    ksid: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 4,
) -> dict[str, tuple[int, int]]:
    """Compact every partition of a keyspace that has ≥ min_files files."""
    out = {}
    for date in list_partitions(lake_dir, ksid):
        part = os.path.join(lake_dir, f"ksid={ksid}", f"date={date}")
        n = len([f for f in os.listdir(part) if f.endswith(".parquet")])
        if n >= min_files:
            out[date] = compact_partition(
                spark, lake_dir, ksid, date, target_file_bytes
            )
    return out

def gc_staging(lake_dir: str, max_age_s: float = 24 * 3600) -> list[str]:
    """Remove orphaned ``_staging/<batch>`` dirs older than ``max_age_s``.

    A crash before the manifest rename leaves staged files with no
    ``_commits/<batch>`` entry; if the stream later replays that batch id
    the writer overwrites them, but a batch id that is never replayed
    (e.g. the checkpoint itself was reset) orphans the dir forever.  They
    are invisible to readers (underscore prefix) but accumulate bytes, so
    the maintenance job sweeps them by age.  A staging dir WITH a manifest
    is in-flight move state and is left alone — the replay path owns it.
    Returns the batch ids removed.
    """
    import time

    staging_root = os.path.join(lake_dir, "_staging")
    commits = os.path.join(lake_dir, "_commits")
    if not os.path.isdir(staging_root):
        return []
    removed = []
    now = time.time()
    for batch in os.listdir(staging_root):
        path = os.path.join(staging_root, batch)
        if os.path.exists(os.path.join(commits, batch)):
            continue  # committed: pending moves, not garbage
        if now - os.path.getmtime(path) < max_age_s:
            continue
        shutil.rmtree(path, ignore_errors=True)
        removed.append(batch)
    return sorted(removed)


def swap_catalog_dir(
    catalog_dir: str,
    tmp: str,
    snapshot_files: set[str],
    retain_seq: int | None = None,
) -> int:
    """Atomically replace ``catalog_dir`` with ``tmp``, salvaging racing
    appends.

    The commit-log CAS serializes rewrites against appends that commit
    BEFORE the CAS — but an append can still land its part files in the
    window between the CAS succeeding and the directory swap (its commit
    then carries a later seq, so losing its files would violate the log
    order).  Closing it: any file present in the old directory that was
    NOT part of the rewrite's input snapshot arrived during the window —
    move it into the new directory before dropping the old one.  Appends
    target the ``catalog_dir`` PATH, so once the old dir is renamed away no
    further files can land in it and the salvage scan is race-free.

    With ``retain_seq`` (the rewrite's log position), the superseded
    generation moves to ``_retained/<seq>/`` instead of being deleted, so
    snapshot reads pinned before the rewrite keep resolving (grace
    window).  Returns the number of salvaged files.
    """
    old = os.path.join(
        os.path.dirname(catalog_dir.rstrip("/")) or ".",
        f"_catalog_old_{uuid.uuid4().hex[:8]}",
    )
    os.rename(catalog_dir, old)
    os.rename(tmp, catalog_dir)
    snapshot_names = {os.path.basename(p) for p in snapshot_files}
    salvaged = 0
    for name in os.listdir(old):
        if name.startswith(("_", ".")):
            continue
        if name in snapshot_names:
            if retain_seq is not None:
                retain_file(catalog_dir, retain_seq, name,
                            os.path.join(old, name))
            continue
        shutil.move(os.path.join(old, name), os.path.join(catalog_dir, name))
        salvaged += 1
    shutil.rmtree(old)
    return salvaged


def dedupe_catalog(
    spark: SparkSession, lake_dir: str, catalog_dir: str, retries: int = 5
) -> dict:
    """Remove duplicate series rows from the catalog (one row per tsid).

    Two writers ingesting the SAME new series concurrently both anti-join
    against the pre-batch catalog and both append it — the anti-join is
    idempotent against the STORED catalog, not against in-flight peers.
    Duplicates are harmless to queries that treat the catalog as a set but
    distort meta counts, so the maintenance job sweeps them: rewrite
    ``dropDuplicates(tsid)`` to a sibling temp dir, then atomically swap,
    guarded by the same commit-log CAS as delete_meta (a put landing
    mid-rewrite restarts it, so the put's series cannot be lost).
    """
    from pyspark.sql import functions as F

    from mycenae_spark.streaming import commitlog

    for _ in range(retries):
        head = commitlog.latest_seq(lake_dir)
        cat = spark.read.parquet(catalog_dir)
        snapshot = set(cat.inputFiles())
        n_before = cat.count()
        uniq = cat.dropDuplicates(["tsid"])
        n_after = uniq.count()
        if n_after == n_before:
            return {"removed": 0, "remaining": n_before}
        base = os.path.dirname(catalog_dir.rstrip("/")) or "."
        tmp = os.path.join(base, f"_catalog_tmp_{uuid.uuid4().hex[:8]}")
        uniq.write.mode("overwrite").parquet(tmp)
        survivor_files = sorted(
            f for f in os.listdir(tmp) if not f.startswith(("_", "."))
        )
        try:
            seq = commitlog.append(
                lake_dir,
                {
                    "kind": "catalog-dedupe",
                    "removed": n_before - n_after,
                    # survivor file list: snapshot readers REPLACE the
                    # catalog's visible set at this log position
                    "files": survivor_files,
                },
                expected_head=head,
            )
        except commitlog.CommitConflict:
            shutil.rmtree(tmp, ignore_errors=True)
            continue
        swap_catalog_dir(catalog_dir, tmp, snapshot, retain_seq=seq)
        return {"removed": n_before - n_after, "remaining": n_after}
    raise RuntimeError("catalog dedupe lost the commit-log race repeatedly")


def gc_commit_markers(
    lake_dir: str, max_age_s: float = REPLAY_WINDOW_S
) -> list[str]:
    """Remove committed-batch markers whose work is finished and old.

    Markers exist for replay idempotence; a marker is safely removable once
    (a) its staged moves completed (no ``_staging/<batch>`` dir remains)
    and (b) it is older than any plausible replay window (streaming
    replays happen within a checkpoint restart; HTTP put ids are never
    replayed at all).  Without GC the façade's one-marker-per-put grows
    unboundedly.  Returns the batch ids removed.
    """
    import time

    commits = os.path.join(lake_dir, "_commits")
    staging_root = os.path.join(lake_dir, "_staging")
    if not os.path.isdir(commits):
        return []
    removed = []
    now = time.time()
    for batch in os.listdir(commits):
        path = os.path.join(commits, batch)
        if batch.endswith(".tmp"):
            continue  # in-flight marker write
        if os.path.exists(os.path.join(staging_root, batch)):
            continue  # moves still pending: the replay path owns it
        if now - os.path.getmtime(path) < max_age_s:
            continue
        os.unlink(path)
        removed.append(batch)
    return sorted(removed)


def gc_commitlog(
    lake_dir: str,
    keep_last: int = 10_000,
    floor_seq: int | None = None,
    min_age_s: float | None = None,
) -> int:
    """Bound the commit log (streaming/commitlog.py): keep the newest
    ``keep_last`` entries — enough for conflict detection and recent-batch
    crash replay, while the log never grows past ~entries × ~100 bytes.

    ``floor_seq`` / ``min_age_s`` pass through to ``commitlog.truncate``'s
    prefix-stable protections: entries at/after a rung-pin floor (currency
    stays provable — no truncation-blindness ladder rebuild churn) and
    entries younger than the replay window (crash-replay + pinned-read
    evidence) survive regardless of ``keep_last``."""
    from mycenae_spark.streaming import commitlog

    return commitlog.truncate(
        lake_dir, keep_last, floor_seq=floor_seq, min_age_s=min_age_s
    )
