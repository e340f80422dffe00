"""Materialized PQ index: commit protocol + fingerprint invalidation.

The index is the amortized form of ``ann_pq_adc_topk`` (functions/pq.py);
its value equality against the DuckDB oracle is covered by
``test_oracle.py::test_oracle_match[ann_pq_search_topk]``.  These tests pin
the lifecycle: build-once reuse, atomic commit visibility, torn-state
refusal, and stat-based invalidation when the source table is regenerated
(the r4/r5 testdata-drift outage mode).
"""

from __future__ import annotations

import os

import pytest

from mycenae_spark.functions import pq
from mycenae_spark.registry.util import r6

from tests.conftest import SF_DIR


@pytest.fixture()
def index_root(tmp_path, monkeypatch):
    root = tmp_path / "pqidx"
    monkeypatch.setenv("MYCENAE_INDEX_ROOT", str(root))
    return root


def test_build_once_then_reuse(spark, index_root):
    d1 = pq.ensure_pq_index(spark, SF_DIR, rounder=r6)
    marker = os.path.join(d1, "_COMMITTED")
    assert os.path.isfile(marker)
    stamp = os.stat(marker).st_mtime_ns
    # Second call must short-circuit on the committed marker, not rebuild.
    d2 = pq.ensure_pq_index(spark, SF_DIR, rounder=r6)
    assert d2 == d1
    assert os.stat(marker).st_mtime_ns == stamp

    unitv, cb, codes = pq.load_pq_index(spark, d1)
    n = unitv.count()
    assert n > 0
    assert codes.count() == n * pq.PQ_M
    assert set(cb.columns) == {"s", "code", "ce"}
    # No leftover staging dirs (winner renamed, nothing orphaned).
    assert [p for p in os.listdir(index_root) if ".build-" in p] == []


def test_ivfpq_inverted_list_layout(spark, index_root):
    """IVFPQ codes are written partitionBy(c_id) — one parquet partition per
    inverted list — and a probe-style filter reaches the scan as a
    PartitionFilter, so unprobed lists are never read."""
    d = pq.ensure_ivfpq_index(spark, SF_DIR, rounder=r6)
    assert d != pq.pq_index_dir(SF_DIR)  # distinct variant namespace
    unitv, cb, codes, cent = pq.load_ivfpq_index(spark, d)
    # every inverted list is a directory; every vector is in exactly one
    lists = [p for p in os.listdir(os.path.join(d, "codes")) if p.startswith("c_id=")]
    assert len(lists) == cent.count()
    assert codes.count() == unitv.count() * pq.PQ_M

    probed = [r["c_id"] for r in cent.limit(2).collect()]
    plan = (
        codes.filter(codes.c_id.isin(probed))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [c_id" in plan


def test_torn_index_is_refused(spark, index_root):
    dest = pq.pq_index_dir(SF_DIR)
    os.makedirs(dest)
    # Non-empty, but no commit marker: external torn state.  Readers must
    # refuse rather than half-read.
    with open(os.path.join(dest, "junk"), "w") as fh:
        fh.write("torn")
    with pytest.raises(FileNotFoundError, match="torn"):
        pq.load_pq_index(spark, dest)
    # The builder cannot atomically replace a non-empty uncommitted dir and
    # must fail loudly, not silently serve either version.
    with pytest.raises(OSError):
        pq.ensure_pq_index(spark, SF_DIR, rounder=r6)


def test_gc_sweeps_stale_dirs_only(spark, index_root):
    import os as _os

    d = pq.ensure_pq_index(spark, SF_DIR, rounder=r6)
    stale_idx = _os.path.join(index_root, "0123456789abcdef")
    _os.makedirs(stale_idx)
    with open(_os.path.join(stale_idx, "_COMMITTED"), "w") as fh:
        fh.write("old")
    stale_staging = _os.path.join(index_root, "feed.build-1-dead")
    _os.makedirs(stale_staging)
    torn = _os.path.join(index_root, "feedfacefeedface")
    _os.makedirs(torn)  # committed-shaped name, NO marker: torn, kept
    old = 1_000_000_000  # well past any max_age
    for p in (stale_idx, stale_staging, torn):
        _os.utime(p, (old, old))

    removed = set(pq.gc_pq_indexes(max_age_s=3600))
    assert removed == {stale_idx, stale_staging}
    assert _os.path.isdir(torn)  # torn state left for a human
    assert _os.path.isdir(d)  # fresh index untouched
    # and it still loads
    unitv, _cb, _codes = pq.load_pq_index(spark, d)
    assert unitv.count() > 0


def test_fingerprint_tracks_source_regeneration(tmp_path):
    sf = tmp_path / "sfX"
    emb = sf / "embeddings.parquet"
    emb.mkdir(parents=True)
    f = emb / "part-0.parquet"
    f.write_bytes(b"v1")
    fp1 = pq.pq_index_fingerprint(str(sf))
    assert fp1 == pq.pq_index_fingerprint(str(sf))  # stat-stable
    # Regenerating the table (new bytes/mtime) must yield a NEW index dir:
    f.write_bytes(b"v2-longer")
    fp2 = pq.pq_index_fingerprint(str(sf))
    assert fp2 != fp1


def test_band_index_build_probe_refresh(spark, index_root, tmp_path):
    """dedup_index_probe's lifecycle contract: build commits atomically
    (marker-gated), probe against the committed index matches the inline
    computation, a second ensure is a no-op reuse, a torn build is
    refused, and a corpus change mints a NEW directory (staleness gate)."""
    import os
    import shutil

    from mycenae_spark.functions import dedup

    sf = tmp_path / "sfB"
    boiler = "the same boilerplate text repeated everywhere forever"
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "one two three four five six seven"),
            (10, boiler), (11, boiler), (12, boiler),  # hot bucket (3 > 2)
            (100, "alpha beta gamma delta epsilon zeta"),
            (101, "totally different words here entirely now"),
            (102, boiler),  # matches only the excised boilerplate bucket
        ],
        "doc_id long, text string",
    )
    docs.coalesce(1).write.parquet(str(sf / "documents.parquet"))
    saved = spark.read.parquet(str(sf / "documents.parquet"))
    corpus = saved.filter("doc_id < 100")
    delta = saved.filter("doc_id >= 100")

    idx1 = dedup.ensure_band_index(
        spark, str(sf), corpus, "doc_id", "text",
        pred_desc="lt100", n_bands=4, max_bucket_size=2,
    )
    assert os.path.isfile(os.path.join(idx1, "_COMMITTED"))
    # reuse, not rebuild
    assert dedup.ensure_band_index(
        spark, str(sf), corpus, "doc_id", "text",
        pred_desc="lt100", n_bands=4, max_bucket_size=2,
    ) == idx1
    out = {
        r["doc_id"]: r
        for r in dedup.probe_band_index(
            spark, idx1, delta, "doc_id", "text", n_bands=4
        ).collect()
    }
    inline = {
        r["doc_id"]: r
        for r in dedup.incremental_minhash_verdicts(
            corpus, delta, "doc_id", "text", n_bands=4, max_bucket_size=2
        ).collect()
    }
    assert {k: tuple(v) for k, v in out.items()} == {
        k: tuple(v) for k, v in inline.items()
    }
    assert out[100]["is_dup"] == 1 and out[100]["dup_of"] == 1
    assert out[101]["is_dup"] == 0
    # the build-time valve excised the boilerplate bucket from the
    # materialized index: the boilerplate delta doc is a structural keep
    assert out[102]["is_dup"] == 0 and out[102]["n_idx_matches"] == 0

    # a probe compiled with different banding params must refuse, not
    # silently return all-keep verdicts (shard functions would diverge)
    with pytest.raises(ValueError, match="was built with"):
        dedup.probe_band_index(
            spark, idx1, delta, "doc_id", "text", n_bands=8
        )
    with pytest.raises(ValueError, match="was built with"):
        dedup.probe_band_index(
            spark, idx1, delta, "doc_id", "text", n_bands=4, n_shards=32
        )

    # torn build (marker removed) is refused by the probe
    os.remove(os.path.join(idx1, "_COMMITTED"))
    with pytest.raises(FileNotFoundError):
        dedup.probe_band_index(spark, idx1, delta, "doc_id", "text")
    shutil.rmtree(idx1)

    # corpus regeneration mints a NEW directory (stat-based fingerprint)
    fp1 = dedup.band_index_fingerprint(str(sf), "lt100", 4, 3, 2, 64)
    pfile = next(
        p for p in (sf / "documents.parquet").iterdir()
        if p.name.endswith(".parquet")
    )
    os.utime(pfile, (1, 1))
    fp2 = dedup.band_index_fingerprint(str(sf), "lt100", 4, 3, 2, 64)
    assert fp2 != fp1
    # and parameter changes do too
    assert dedup.band_index_fingerprint(str(sf), "lt100", 8, 3, 2, 64) != fp2


def test_langid_artifact_lifecycle(spark, index_root):
    """The langid profile artifact (functions/langid.py) follows the
    shared CAS+marker protocol: build-once reuse, torn-build refusal,
    in-artifact params validation (an order-set mismatch raises instead
    of silently scoring the wrong profile family), and search/inline
    agreement (the artifact is a pure factoring of the training stage)."""
    import shutil

    from mycenae_spark.functions import langid as li
    from mycenae_spark.registry.llm_queries import langid_mixture_confusion

    d1 = li.ensure_langid_profiles(spark, SF_DIR, (3,))
    marker = os.path.join(d1, "_COMMITTED")
    assert os.path.isfile(marker)
    stamp = os.stat(marker).st_mtime_ns
    assert li.ensure_langid_profiles(spark, SF_DIR, (3,)) == d1
    assert os.stat(marker).st_mtime_ns == stamp

    prof, pnorm, dtf, dnorm = li.load_langid_profiles(spark, d1, (3,))
    assert prof.count() > 0 and pnorm.count() > 0
    # v2: per-document features materialized beside the profiles
    assert dtf.count() > 0 and dnorm.count() > 0
    assert {"doc_id", "lang", "ord", "gram", "tf"} <= set(dtf.columns)

    # order-set mismatch against the persisted params raises
    with pytest.raises(ValueError, match="orders"):
        li.load_langid_profiles(spark, d1, (1, 3))

    # search phase == inline training+scoring, row for row
    idx_rows = {
        (r["lang"], r["pred"]): r["n"]
        for r in li.langid_confusion_indexed(spark, SF_DIR, (3,)).collect()
    }
    inline_rows = {
        (r["lang"], r["pred"]): r["n"]
        for r in langid_mixture_confusion(spark, SF_DIR, (3,)).collect()
    }
    assert idx_rows == inline_rows

    # torn build (marker removed) is refused
    os.remove(marker)
    with pytest.raises(FileNotFoundError):
        li.load_langid_profiles(spark, d1, (3,))
    shutil.rmtree(d1, ignore_errors=True)
    # a different order set mints a DIFFERENT artifact directory
    assert li.langid_index_dir(SF_DIR, (1, 3)) != li.langid_index_dir(
        SF_DIR, (3,)
    )


def test_sig_index_build_probe_refresh(spark, index_root, tmp_path):
    """dedup_media_index_probe's lifecycle contract (r15): the committed
    perceptual signature index matches the inline two-sided probe
    exactly, a second ensure is a marker reuse, the build-time valve
    excises hot segments, a params mismatch refuses, and a corpus change
    mints a new directory."""
    import os

    import pyspark.sql.functions as F

    from mycenae_spark.functions import dedup

    sf = tmp_path / "sfS"
    # signatures direct (no decode needed to test the index contract):
    # 1/2 identical, 3 near (hamming 1), 4 far; 100 probes near 1;
    # 101 far from everything
    rows = [(1, 0x0F0F), (2, 0x0F0F), (3, 0x0F0E), (4, -1)]
    probe_rows = [(100, 0x0F0B), (101, 0x7E00FF00FF00FF0F)]
    spark.createDataFrame(
        [(i, "x") for i, _ in rows + probe_rows], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(sf / "documents.parquet"))
    isigs = spark.createDataFrame(rows, "media_id long, dhash long")
    psigs = spark.createDataFrame(probe_rows, "media_id long, dhash long")

    idx = dedup.ensure_sig_index(
        spark, str(sf), isigs, "media_id", "dhash",
        pred_desc="t", kind="dhash-test", bits=64, n_segments=6,
        max_bucket_size=512,
    )
    assert os.path.isfile(os.path.join(idx, "_COMMITTED"))
    assert dedup.ensure_sig_index(
        spark, str(sf), isigs, "media_id", "dhash",
        pred_desc="t", kind="dhash-test", bits=64, n_segments=6,
        max_bucket_size=512,
    ) == idx

    got = {
        (r["probe_id"], r["idx_id"], r["hamming"])
        for r in dedup.probe_sig_index(
            spark, idx, psigs, "media_id", "dhash",
            bits=64, n_segments=6, max_hamming=5,
        ).collect()
    }
    inline = {
        (r["probe_id"], r["idx_id"], r["hamming"])
        for r in dedup.hamming_probe_sigs(
            isigs, psigs, "media_id", "dhash",
            bits=64, n_segments=6, max_hamming=5,
        ).collect()
    }
    assert got == inline
    # 0x0F0B vs 0x0F0F: one flipped bit; vs 0x0F0E: two
    assert got == {(100, 1, 1), (100, 2, 1), (100, 3, 2)}
    assert not any(p == 101 for p, _i, _h in got)  # far probe keeps

    # params mismatch refuses instead of silently missing collisions
    with pytest.raises(ValueError, match="was built with"):
        dedup.probe_sig_index(
            spark, idx, psigs, "media_id", "dhash",
            bits=64, n_segments=4, max_hamming=3,
        )

    # staleness: regenerating the documents table mints a NEW directory
    fp1 = dedup.sig_index_fingerprint(str(sf), "t", "dhash-test", 64, 6,
                                      512, dedup.SIG_INDEX_SHARDS)
    for f in (sf / "documents.parquet").iterdir():
        if f.suffix == ".parquet":
            f.write_bytes(f.read_bytes() + b"x")
    fp2 = dedup.sig_index_fingerprint(str(sf), "t", "dhash-test", 64, 6,
                                      512, dedup.SIG_INDEX_SHARDS)
    assert fp1 != fp2

    # build-time valve: a hot segment (many identical sigs over the cap)
    # is excised from the index, so its probes are structural keeps
    hot = spark.createDataFrame(
        [(i, 0x1111) for i in range(10, 16)], "media_id long, dhash long"
    )
    idx2 = dedup.ensure_sig_index(
        spark, str(sf), hot, "media_id", "dhash",
        pred_desc="hot", kind="dhash-test", bits=64, n_segments=6,
        max_bucket_size=5,
    )
    got2 = dedup.probe_sig_index(
        spark, idx2,
        spark.createDataFrame([(200, 0x1111)], "media_id long, dhash long"),
        "media_id", "dhash", bits=64, n_segments=6, max_hamming=5,
    ).collect()
    assert got2 == []


def test_sig_index_assimilate_equals_rebuild(spark, index_root, tmp_path):
    """assimilate_sig_index (r16): probing the grown index is
    INDISTINGUISHABLE from probing one rebuilt from scratch over
    base ∪ delta — including the valve re-binding on TRUE merged bucket
    sizes (a bucket at the cap in the base that crosses it with the
    delta is excised WITH its base rows; a bucket excised at build stays
    excised after a one-member delta); untouched base partitions are
    hard-linked, not rewritten; re-assimilating the same delta is an
    idempotent cache hit; chained assimilation composes; a torn base
    refuses."""
    import os

    from mycenae_spark.functions import dedup

    sf = tmp_path / "sfA"
    spark.createDataFrame(
        [(i, "x") for i in range(40)], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(sf / "documents.parquet"))

    CAP = 2
    # base: 0x1111 ×2 (AT the cap — kept), 0x7777 ×4 (over — excised at
    # build, capped/ records n=4), 0x0200…0F0F (bit 57 set: its j=5
    # segment lands in a (j, shard) partition no delta sig touches)
    base = spark.createDataFrame(
        [(1, 0x1111), (2, 0x1111),
         (10, 0x7777), (11, 0x7777), (12, 0x7777), (13, 0x7777),
         (30, 0x0200000000000F0F)],
        "media_id long, dhash long",
    )
    # delta: one more 0x1111 (crosses the cap → whole bucket excised),
    # one more 0x7777 (stays excised), a fresh near-pair 0x2222/0x2223
    delta = spark.createDataFrame(
        [(3, 0x1111), (14, 0x7777), (4, 0x2222), (5, 0x2223)],
        "media_id long, dhash long",
    )
    probes = spark.createDataFrame(
        [(100, 0x1111), (101, 0x2222), (102, 0x7777)],
        "media_id long, dhash long",
    )
    kw = dict(bits=64, n_segments=6, max_bucket_size=CAP)

    base_dir = dedup.ensure_sig_index(
        spark, str(sf), base, "media_id", "dhash",
        pred_desc="base", kind="dhash-test", **kw,
    )
    grown = dedup.assimilate_sig_index(
        spark, base_dir, delta, "media_id", "dhash"
    )
    assert grown != base_dir and os.path.isfile(
        os.path.join(grown, "_COMMITTED")
    )
    # idempotent: same base + same delta → the SAME committed directory
    assert dedup.assimilate_sig_index(
        spark, base_dir, delta, "media_id", "dhash"
    ) == grown

    rebuilt = dedup.ensure_sig_index(
        spark, str(sf), base.unionByName(delta), "media_id", "dhash",
        pred_desc="union", kind="dhash-test", **kw,
    )

    def probe(d):
        return {
            (r["probe_id"], r["idx_id"], r["hamming"])
            for r in dedup.probe_sig_index(
                spark, d, probes, "media_id", "dhash",
                bits=64, n_segments=6, max_hamming=5,
            ).collect()
        }

    got, want = probe(grown), probe(rebuilt)
    assert got == want
    # and the verdicts are the ones the valve story predicts: 0x1111
    # crossed the cap during assimilation (excised with its base rows),
    # 0x7777 was excised at build and STAYS excised, the fresh 0x2222
    # pair is findable (0x2223 is hamming-1 away)
    assert got == {(101, 4, 0), (101, 5, 1)}
    # yesterday's delta is visible to today's probe (the lifecycle point)
    assert any(i in (4, 5) for _p, i, _h in got)

    # untouched base partition (j=5 of the bit-57 sig) was HARD-LINKED:
    # same inode serves both directories
    part = os.path.join(grown, "segments", "j=5", "shard=8")
    files = [f for f in os.listdir(part) if f.endswith(".parquet")]
    assert files and all(
        os.stat(os.path.join(part, f)).st_nlink >= 2 for f in files
    )

    # chained assimilation composes: day-2 delta onto the grown index.
    # A second 0x2222 pushes the shared-with-0x2223 segment buckets over
    # the cap (excised in BOTH paths), but the j=0 segment differs
    # between 0x2222 and 0x2223, so that bucket holds exactly {4, 6} —
    # at the cap, kept — and the probe still finds the exact twins.
    delta2 = spark.createDataFrame(
        [(6, 0x2222)], "media_id long, dhash long"
    )
    grown2 = dedup.assimilate_sig_index(
        spark, grown, delta2, "media_id", "dhash"
    )
    rebuilt2 = dedup.ensure_sig_index(
        spark, str(sf), base.unionByName(delta).unionByName(delta2),
        "media_id", "dhash", pred_desc="union2", kind="dhash-test", **kw,
    )
    assert probe(grown2) == probe(rebuilt2) == {(101, 4, 0), (101, 6, 0)}

    # a torn base (no commit marker) refuses
    with pytest.raises(FileNotFoundError, match="torn"):
        dedup.assimilate_sig_index(
            spark, str(tmp_path / "nope"), delta, "media_id", "dhash"
        )


def test_band_index_assimilate_equals_rebuild(spark, index_root, tmp_path):
    """assimilate_band_index (r16): the text-family twin rides the same
    merge kernel — probe-after-assimilate equals rebuild-from-scratch
    over base ∪ delta, idempotent re-assimilation, lineage recorded."""
    import json
    import os

    from mycenae_spark.functions import dedup

    sf = tmp_path / "sfB"
    words = "the quick brown fox jumps over a lazy dog near the old river"
    # one exact-duplicate family (every %3==0 doc) + fully-disjoint word
    # salads elsewhere: a shared-prefix corpus would collide EVERY band
    # bucket and the valve would (correctly) excise the whole index
    docs = [
        (i, words if i % 3 == 0
         else " ".join(f"w{i}x{k}" for k in range(12)))
        for i in range(30)
    ]
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(sf / "documents.parquet"))
    d = spark.read.parquet(str(sf / "documents.parquet"))

    base_dir = dedup.ensure_band_index(
        spark, str(sf), d.filter("doc_id % 3 != 2"), "doc_id", "text",
        pred_desc="b", n_bands=4, max_bucket_size=16,
    )
    delta = d.filter("doc_id % 3 = 2")
    grown = dedup.assimilate_band_index(
        spark, base_dir, delta, "doc_id", "text"
    )
    assert dedup.assimilate_band_index(
        spark, base_dir, delta, "doc_id", "text"
    ) == grown  # idempotent cache hit
    rebuilt = dedup.ensure_band_index(
        spark, str(sf), d, "doc_id", "text",
        pred_desc="u", n_bands=4, max_bucket_size=16,
    )
    probes = spark.createDataFrame(
        [(100, words), (101, "completely unrelated text with nothing shared")],
        "doc_id long, text string",
    )

    def verdicts(idx):
        return {
            tuple(r)
            for r in dedup.probe_band_index(
                spark, idx, probes, "doc_id", "text", n_bands=4
            ).collect()
        }

    got = verdicts(grown)
    assert got == verdicts(rebuilt)
    # the exact-duplicate probe found corpus matches on BOTH sides of the
    # day split (delta ids 2, 5, ... are % 3 == 2; id 0's text is probe
    # 100's verbatim), the unrelated probe kept
    by_id = {p: (dup, n, isd) for p, dup, n, isd in got}
    assert by_id[100][2] == 1 and by_id[100][0] == 0
    assert by_id[101] == (-1, 0, 0)
    # params lineage chains the base fingerprint
    with open(os.path.join(grown, "_params.json")) as fh:
        assert len(json.load(fh)["lineage"]) == 1


def test_sig_index_compact_is_invisible(spark, index_root, tmp_path):
    """compact_sig_index (r16): after an assimilation chain leaves two
    files in a partition, compaction rewrites to ONE file per partition
    with probe results identical to the chain's; re-compacting is an
    idempotent cache hit; lineage chains."""
    import json
    import os

    from mycenae_spark.functions import dedup

    sf = tmp_path / "sfC"
    spark.createDataFrame(
        [(i, "x") for i in range(10)], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(sf / "documents.parquet"))
    base = dedup.ensure_sig_index(
        spark, str(sf),
        spark.createDataFrame(
            [(1, 0x0F0F), (2, 0x0F0E)], "media_id long, dhash long"
        ),
        "media_id", "dhash",
        pred_desc="c", kind="dhash-test", bits=64, n_segments=6,
        max_bucket_size=512,
    )
    grown = dedup.assimilate_sig_index(
        spark, base,
        spark.createDataFrame([(3, 0x0F0B)], "media_id long, dhash long"),
        "media_id", "dhash",
    )
    # the chain really does hold >1 file in a shared partition
    multi = [
        (root, fs)
        for root, _d, fs in os.walk(os.path.join(grown, "segments"))
        if len([f for f in fs if f.endswith(".parquet")]) > 1
    ]
    assert multi, "assimilation should append a second file somewhere"

    compacted = dedup.compact_sig_index(spark, grown)
    assert compacted != grown
    assert dedup.compact_sig_index(spark, grown) == compacted  # idempotent
    for root, _d, fs in os.walk(os.path.join(compacted, "segments")):
        assert len([f for f in fs if f.endswith(".parquet")]) <= 1, root

    probes = spark.createDataFrame(
        [(100, 0x0F0F)], "media_id long, dhash long"
    )

    def probe(d):
        return {
            tuple(r)
            for r in dedup.probe_sig_index(
                spark, d, probes, "media_id", "dhash",
                bits=64, n_segments=6, max_hamming=5,
            ).collect()
        }

    got = probe(compacted)
    assert got == probe(grown)
    # 0x0F0F vs itself: 0; vs 0x0F0E: 1 flipped bit; vs 0x0F0B: 1
    assert got == {(100, 1, 0), (100, 2, 1), (100, 3, 1)}
    with open(os.path.join(compacted, "_params.json")) as fh:
        assert len(json.load(fh)["lineage"]) == 2  # base→grown→compacted


def test_ivfpq_assimilate_appends_frozen_encoded_delta(spark, index_root):
    """assimilate_ivfpq_index (r16): FAISS add() semantics — the delta is
    encoded with the FROZEN codebook and assigned to the FROZEN
    centroids, its rows append beside hard-linked base tables, the grown
    index's code/unitv row counts cover base ∪ delta, a delta vector is
    findable as its own nearest neighbor, re-assimilation is an
    idempotent cache hit, and a torn base refuses."""
    import os

    import pyspark.sql.functions as F

    from mycenae_spark.functions import pq
    from mycenae_spark.registry.util import r6

    delta_pred = F.col("vec_id") % 10 == 7
    base = pq.ensure_ivfpq_index(
        spark, SF_DIR, rounder=r6, pred=~delta_pred, pred_desc="mod10ne7"
    )
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    delta = e.filter(delta_pred).select("vec_id", "embedding")
    n_delta, n_all = delta.count(), e.count()

    grown = pq.assimilate_ivfpq_index(spark, base, delta, rounder=r6)
    assert grown != base
    assert pq.assimilate_ivfpq_index(
        spark, base, delta, rounder=r6
    ) == grown  # idempotent

    unitv, cb, codes, cent = pq.load_ivfpq_index(spark, grown)
    b_unitv, b_cb, b_codes, b_cent = pq.load_ivfpq_index(spark, base)
    assert unitv.count() == n_all and b_unitv.count() == n_all - n_delta
    assert codes.count() == b_codes.count() + n_delta * pq.PQ_M
    # frozen artifacts: codebook and centroids are IDENTICAL relations
    assert cent.count() == b_cent.count()
    assert cb.exceptAll(b_cb).count() == 0 and b_cb.exceptAll(cb).count() == 0

    # a delta vector searched against the grown index finds ITSELF
    # (external-vector path, no self-exclusion): assimilation made it
    # visible to every future search
    probe_vec = delta.limit(1).collect()[0]
    got = pq.ivfpq_search_vectors(
        unitv, cb, codes, cent,
        spark.createDataFrame(
            [(999_999, [float(x) for x in probe_vec["embedding"]])],
            "vec_id long, embedding array<double>",
        ),
        rounder=r6, nprobe=4, k=1,
    ).collect()
    assert got and got[0]["n_id"] == probe_vec["vec_id"]
    assert abs(got[0]["cos_r"] - 1.0) < 1e-5

    with pytest.raises(FileNotFoundError, match="torn"):
        pq.assimilate_ivfpq_index(
            spark, os.path.join(str(index_root), "nope"), delta, rounder=r6
        )


def test_media_corpus_artifact_lifecycle(spark, index_root, tmp_path):
    """ensure_media_corpus (r15): committed once and reused, marker-gated
    reads refuse a torn build, kinds mint distinct directories, and a
    regenerated documents table or a render-spec bump mints a NEW
    corpus."""
    import os
    import shutil

    from mycenae_spark.functions import multimodal as mm

    sf = tmp_path / "sfM"
    spark.createDataFrame(
        [(i, "t") for i in range(12)], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(sf / "documents.parquet"))

    d1 = mm.ensure_media_corpus(spark, str(sf), "png")
    assert os.path.isfile(os.path.join(d1, "_COMMITTED"))
    assert mm.ensure_media_corpus(spark, str(sf), "png") == d1  # reuse
    rows = {r["media_id"]: r["payload"]
            for r in mm.media_corpus(spark, str(sf), "png").collect()}
    assert len(rows) == 12
    # payloads are the deterministic spec renders
    w, h, ct, gray, px = mm.pixel_corpus_image(5)
    assert rows[5] == mm.encode_png(px, ct, row_filters=lambda y: y % 5,
                                    n_idat=2)
    # kinds are distinct artifacts
    d2 = mm.ensure_media_corpus(spark, str(sf), "afp")
    assert d2 != d1
    # torn state (marker removed): the rebuilder cannot atomically
    # replace a non-empty uncommitted dir and must fail loudly — the
    # shared _commit_index contract (see test_torn_index_is_refused)
    os.remove(os.path.join(d1, "_COMMITTED"))
    with pytest.raises(OSError):
        mm.media_corpus(spark, str(sf), "png")
    shutil.rmtree(d1, ignore_errors=True)
    # with the torn dir cleared, the rebuild commits and reads again
    assert len(mm.media_corpus(spark, str(sf), "png").collect()) == 12
    # staleness: regenerated documents table mints a new fingerprint
    fp1 = mm.media_corpus_fingerprint(str(sf), "png")
    for f in (sf / "documents.parquet").iterdir():
        if f.suffix == ".parquet":
            f.write_bytes(f.read_bytes() + b"x")
    assert mm.media_corpus_fingerprint(str(sf), "png") != fp1


def test_ivfpq_compact_equals_chain(spark, index_root):
    """compact_ivfpq_index: searching the compacted index returns exactly
    the chain's rows (pure physical change), the codes table collapses to
    one file per inverted list, re-compacting is an idempotent cache hit,
    and a torn chain refuses."""
    import os

    import pyspark.sql.functions as F

    from mycenae_spark.functions import pq
    from mycenae_spark.sources.tables import load_table

    e = load_table(spark, SF_DIR, "embeddings")
    delta_pred = F.col("vec_id") % 10 == 7
    base = pq.ensure_ivfpq_index(
        spark, SF_DIR, rounder=r6, pred=~delta_pred, pred_desc="mod10ne7"
    )
    grown = pq.assimilate_ivfpq_index(
        spark, base, e.filter(delta_pred).select("vec_id", "embedding"),
        rounder=r6,
    )
    compacted = pq.compact_ivfpq_index(spark, grown)
    assert compacted not in (base, grown)
    assert pq.compact_ivfpq_index(spark, grown) == compacted  # idempotent

    queries = e.filter(F.col("vec_id") < 10).select("vec_id", "embedding")

    def search(d):
        unitv, cb, codes, cent = pq.load_ivfpq_index(spark, d)
        return {
            tuple(r)
            for r in pq.ivfpq_search(
                unitv, cb, codes, cent, queries, rounder=r6, nprobe=8, k=3
            ).collect()
        }

    assert search(compacted) == search(grown)

    def files_per_list(d):
        root = os.path.join(d, "codes")
        return {
            sub: sum(
                1 for f in os.listdir(os.path.join(root, sub))
                if f.endswith(".parquet")
            )
            for sub in os.listdir(root)
            if sub.startswith("c_id=")
        }

    chain_files = files_per_list(grown)
    compact_files = files_per_list(compacted)
    assert set(compact_files) == set(chain_files)  # same inverted lists
    assert all(n == 1 for n in compact_files.values())
    assert any(n > 1 for n in chain_files.values())  # the chain amplified
    # unitv compacts to the size-targeted file count (1 at this scale)
    n_unitv = sum(
        1 for f in os.listdir(os.path.join(compacted, "unitv"))
        if f.endswith(".parquet")
    )
    assert n_unitv == 1

    os.remove(os.path.join(grown, "_COMMITTED"))
    with pytest.raises(FileNotFoundError):
        pq.compact_ivfpq_index(spark, grown)


def test_ivfpq_search_vectors_bulk_equals_serving(spark, index_root):
    """The bulk regime (streaming-ingest batches: no query-proportional
    driver collect or forced broadcast) must return exactly the serving
    regime's rows — same probes, same ADC, same rerank, different
    physical plan only."""
    import pyspark.sql.functions as F

    from mycenae_spark.functions import pq
    from mycenae_spark.sources.tables import load_table

    idx = pq.ensure_ivfpq_index(spark, SF_DIR, rounder=r6)
    unitv, cb, codes, cent = pq.load_ivfpq_index(spark, idx)
    qvecs = (
        load_table(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id") < 12)
        .select((F.col("vec_id") + 9000).alias("vec_id"), "embedding")
    )

    def rows(bulk):
        return sorted(
            tuple(r)
            for r in pq.ivfpq_search_vectors(
                unitv, cb, codes, cent, qvecs, r6,
                nprobe=8, k=3, bulk=bulk,
            ).collect()
        )

    serving, bulk = rows(False), rows(True)
    assert serving == bulk and len(serving) > 0
    # the bulk plan must still prune the codes scan to the probed lists
    plan = (
        pq.ivfpq_search_vectors(
            unitv, cb, codes, cent, qvecs, r6, nprobe=8, k=3, bulk=True
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [c_id" in plan


def test_ivfpq_retrain_from_chain(spark, index_root):
    """retrain_ivfpq_index: cuts a committed generation whose codebook
    and centroids come from the chain's covered corpus (not the frozen
    day-0 artifacts), covers exactly the chain's ids, is idempotent, and
    refuses a torn chain."""
    import os

    import pyspark.sql.functions as F

    from mycenae_spark.functions import pq
    from mycenae_spark.sources.tables import load_table

    e = load_table(spark, SF_DIR, "embeddings")
    base_pred = F.col("vec_id") % 10 < 7
    chain = pq.ensure_ivfpq_index(
        spark, SF_DIR, rounder=r6, pred=base_pred, pred_desc="mod10lt7"
    )
    for mod in (7, 8):
        chain = pq.assimilate_ivfpq_index(
            spark, chain,
            e.filter(F.col("vec_id") % 10 == mod)
            .select("vec_id", "embedding"),
            rounder=r6,
        )
    newgen = pq.retrain_ivfpq_index(spark, chain, rounder=r6)
    assert newgen != chain
    assert pq.retrain_ivfpq_index(spark, chain, rounder=r6) == newgen

    old_u, _ocb, _oc, old_cent = pq.load_ivfpq_index(spark, chain)
    new_u, _ncb, new_codes, new_cent = pq.load_ivfpq_index(spark, newgen)
    ids = lambda df, c="vec_id": {r[c] for r in df.select(c).collect()}  # noqa: E731
    covered = ids(old_u)
    assert ids(new_u) == covered            # same coverage,
    assert ids(new_codes) == covered        # every vector re-encoded
    # centroids re-picked by the mod rule over the COVERED ids: the
    # frozen chain only had base centroids; covered %100==0 is the same
    # set here (mod-100 ⊂ mod-10<7), but they must now store unit vecs
    new_c = {r["c_id"] for r in new_cent.collect()}
    assert new_c == {i for i in covered if i % 100 == 0}
    nrm = new_cent.select(
        F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x)
    ).collect()[0][0]
    assert abs(nrm - 1.0) < 1e-9            # unit-vector contract

    # retrained index answers (searchable end to end, k rows per query)
    q = e.filter(F.col("vec_id") < 7).select("vec_id", "embedding")
    got = pq.ivfpq_search(
        new_u, _ncb, new_codes, new_cent, q, rounder=r6, nprobe=8, k=3
    ).collect()
    assert len(got) == 21

    os.remove(os.path.join(chain, "_COMMITTED"))
    with pytest.raises(FileNotFoundError):
        pq.retrain_ivfpq_index(spark, chain, rounder=r6)


def test_band_valve_report_tracks_assimilation(spark, index_root, tmp_path):
    """band_index_valve_report over an ASSIMILATED chain equals the
    report over an index rebuilt from scratch on the union — the
    persisted capped/ accounting (which the merge kernel re-binds on
    TRUE merged bucket sizes) matches the data at every generation,
    including a bucket that only crossed the cap BECAUSE of the delta."""
    from mycenae_spark.functions import dedup

    sf = tmp_path / "sfV"
    spark.createDataFrame(
        [(i, "x") for i in range(40)], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(sf / "documents.parquet"))

    boiler = "the same boilerplate text repeated everywhere forever"
    base = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),
         (10, boiler), (11, boiler)],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [(3, "alpha beta gamma delta epsilon zeta"),  # crosses cap=2 NOW
         (20, "fresh words never seen before anywhere")],
        "doc_id long, text string",
    )
    kw = dict(n_bands=4, max_bucket_size=2)
    base_dir = dedup.ensure_band_index(
        spark, str(sf), base, "doc_id", "text", pred_desc="vbase", **kw
    )
    grown = dedup.assimilate_band_index(
        spark, base_dir, delta, "doc_id", "text"
    )
    rebuilt = dedup.ensure_band_index(
        spark, str(sf), base.unionByName(delta), "doc_id", "text",
        pred_desc="vunion", **kw,
    )

    def report(d):
        return sorted(
            tuple(r)
            for r in dedup.band_index_valve_report(spark, d).collect()
        )

    assert report(grown) == report(rebuilt)
    # the alpha-triple bucket (3 > 2) is excised in BOTH, per band
    g = {r[0]: r for r in report(grown)}
    assert all(g[b][1] >= 1 and g[b][2] >= 3 for b in range(4))


def test_band_valve_report_pre_v2_is_descriptive(spark, tmp_path):
    """A pre-v2 band index (no capped/ accounting) must get the
    assimilation verbs' descriptive "needs version N — rebuild" error,
    not a raw path-missing AnalysisException (r16 ADVICE)."""
    import json

    from mycenae_spark.functions import dedup

    old = tmp_path / "prev2"
    old.mkdir()
    (old / "_COMMITTED").write_text("deadbeef")
    (old / "_params.json").write_text(json.dumps({"version": 1}))
    with pytest.raises(ValueError, match="needs version"):
        dedup.band_index_valve_report(spark, str(old))
