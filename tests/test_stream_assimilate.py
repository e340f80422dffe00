"""Streaming ingest → probe → assimilate bridge
(streaming/assimilate.py::media_assimilate_stream).

The contract under test: draining N crawl-day files through the bridge
is INDISTINGUISHABLE from running the batch verbs (probe_sig_index →
keep → assimilate_sig_index) N times by hand — same verdicts, and a
final index that answers exactly like one rebuilt from scratch over
base ∪ all keeps.  Plus the operational edges: undecodable payloads are
verdicted keep but never enter the index, an all-dup batch leaves the
chain unchanged, and a micro-batch spanning two crawl days refuses
loudly instead of silently collapsing the per-day lifecycle.
"""

from __future__ import annotations

import base64
import json
import os

import pytest

import pyspark.sql.functions as F

from mycenae_spark.functions import dedup
from mycenae_spark.functions.multimodal import (
    _GRAY_PALETTE,
    dhash_media,
    encode_gif,
    encode_png,
    pixel_corpus_image,
)
from mycenae_spark.streaming.assimilate import (
    VERDICT_SCHEMA,
    media_assimilate_stream,
    read_bridge_output,
    write_day_files as _write_days,
)

from tests.conftest import SF_DIR


@pytest.fixture()
def index_root(tmp_path, monkeypatch):
    root = tmp_path / "pqidx"
    monkeypatch.setenv("MYCENAE_INDEX_ROOT", str(root))
    return root


def _png(d):
    _w, _h, ct, _gray, px = pixel_corpus_image(d)
    return encode_png(px, ct, row_filters=lambda y: y % 5, n_idat=2)


def _gif(d):
    _w, _h, _ct, gray, _px = pixel_corpus_image(d)
    return encode_gif(gray, _GRAY_PALETTE)


def _jrow(mid, day, payload):
    return json.dumps(
        {"media_id": mid, "day": day,
         "payload_b64": base64.b64encode(payload).decode()}
    )


def _base_index(spark, payloads):
    sigs = dhash_media(
        spark.createDataFrame(
            [(i, bytearray(p)) for i, p in payloads],
            "media_id long, payload binary",
        ),
        max_batch_bytes=1 << 20,
    ).select("media_id", "dhash")
    return dedup.ensure_sig_index(
        spark, SF_DIR, sigs, "media_id", "dhash",
        pred_desc="bridge-test-base", kind="dhash-test",
        bits=64, n_segments=6, max_bucket_size=512,
    )


def _probe_set(spark, d, probes):
    return {
        (r["probe_id"], r["idx_id"], r["hamming"])
        for r in dedup.probe_sig_index(
            spark, d, probes, "media_id", "dhash",
            bits=64, n_segments=6, max_hamming=5,
        ).collect()
    }


def test_bridge_matches_batch_lifecycle(spark, index_root, tmp_path):
    """Two crawl days through the bridge: day 1's verdicts equal the
    hand-run batch probe against the base; day 2 catches a re-encode of
    a day-1 KEEP (the cross-batch assimilation proof); an undecodable
    payload is verdicted keep with dup_of=-1 but never indexed; the
    final generation answers exactly like a from-scratch rebuild over
    base ∪ all decodable keeps."""
    src = str(tmp_path / "src")
    vdir = str(tmp_path / "verdicts")
    base_dir = _base_index(spark, [(d, _png(d)) for d in range(6)])

    day1 = (
        [_jrow(1000, 1, _gif(0))]                       # dup of triple 0
        + [_jrow(1000 + d, 1, _png(d)) for d in (6, 7, 8)]  # new triple
        + [_jrow(1999, 1, b"not an image")]             # undecodable
    )
    day2 = [_jrow(2000, 2, _gif(6)),                    # dup of DAY-1 keep
            _jrow(2001, 2, _png(9))]                    # new
    _write_days(src, [("day1.jsonl", day1), ("day2.jsonl", day2)])

    chain = media_assimilate_stream(spark, src, base_dir, vdir)
    assert len(chain) == 3 and chain[0] == base_dir

    v = read_bridge_output(spark, vdir, VERDICT_SCHEMA)
    got = {
        r["media_id"]: (r["day"], r["dup_of"], r["is_dup"])
        for r in v.collect()
    }
    assert got[1000] == (1, 0, 1)       # GIF re-encode caught by day 0
    assert got[1006] == (1, -1, 0)
    assert got[1007] == (1, -1, 0)
    assert got[1008] == (1, -1, 0)
    assert got[1999] == (1, -1, 0)      # undecodable: keep, no evidence
    assert got[2000] == (2, 1006, 1)    # caught ONLY via assimilation
    assert got[2001] == (2, -1, 0)
    assert len(got) == 7

    # day-1 verdict parity with the hand-run batch verb against the base
    d1_sigs = dhash_media(
        spark.createDataFrame(
            [(1000, bytearray(_gif(0)))]
            + [(1000 + d, bytearray(_png(d))) for d in (6, 7, 8)]
            + [(1999, bytearray(b"not an image"))],
            "media_id long, payload binary",
        ),
        max_batch_bytes=1 << 20,
    ).select("media_id", "dhash")
    hand = dedup.probe_sig_index(
        spark, base_dir, d1_sigs, "media_id", "dhash",
        bits=64, n_segments=6, max_hamming=5,
    )
    hand_dups = {r["probe_id"] for r in hand.collect()}
    assert hand_dups == {m for m, (d, _, s) in got.items() if d == 1 and s}

    # final generation == rebuild from scratch over base ∪ decodable keeps
    keeps = spark.createDataFrame(
        [(d, bytearray(_png(d))) for d in range(6)]
        + [(1000 + d, bytearray(_png(d))) for d in (6, 7, 8)]
        + [(2001, bytearray(_png(9)))],
        "media_id long, payload binary",
    )
    rebuilt = dedup.ensure_sig_index(
        spark, SF_DIR,
        dhash_media(keeps, max_batch_bytes=1 << 20)
        .select("media_id", "dhash"),
        "media_id", "dhash",
        pred_desc="bridge-test-union", kind="dhash-test",
        bits=64, n_segments=6, max_bucket_size=512,
    )
    probes = dhash_media(
        spark.createDataFrame(
            [(9000 + d, bytearray(_gif(d))) for d in (0, 3, 6, 9)],
            "media_id long, payload binary",
        ),
        max_batch_bytes=1 << 20,
    ).select("media_id", "dhash")
    assert _probe_set(spark, chain[-1], probes) == _probe_set(
        spark, rebuilt, probes
    )
    # the undecodable asset never entered the index
    final_ids = {
        r["idx_id"]
        for r in spark.read.schema(
            "idx_id long, sig long, segval long, j int, shard bigint"
        )
        .parquet(os.path.join(chain[-1], "segments"))
        .select("idx_id")
        .distinct()
        .collect()
    }
    assert 1999 not in final_ids
    assert {1006, 1007, 1008, 2001} <= final_ids


def test_bridge_all_dup_batch_keeps_chain(spark, index_root, tmp_path):
    """A batch with zero keeps must not mint a new index generation —
    and the following batch still probes the unchanged chain head."""
    src = str(tmp_path / "src")
    vdir = str(tmp_path / "verdicts")
    base_dir = _base_index(spark, [(d, _png(d)) for d in range(6)])

    _write_days(
        src,
        [
            ("day1.jsonl", [_jrow(1000, 1, _gif(0)), _jrow(1001, 1, _gif(3))]),
            ("day2.jsonl", [_jrow(2000, 2, _png(6))]),
        ],
    )
    chain = media_assimilate_stream(spark, src, base_dir, vdir)
    assert chain[0] == base_dir and len(chain) == 2  # day 1 grew nothing
    v = read_bridge_output(spark, vdir, VERDICT_SCHEMA)
    assert v.filter("day = 1").agg(F.sum("is_dup")).collect()[0][0] == 2
    assert v.filter("day = 2").collect()[0]["is_dup"] == 0


def test_bridge_mixed_day_batch_refuses(spark, index_root, tmp_path):
    """One file spanning two crawl days breaks the probe-then-assimilate
    per-day contract: the bridge must raise, not silently verdict day 2
    against an index that should already contain day 1's keeps."""
    src = str(tmp_path / "src")
    vdir = str(tmp_path / "verdicts")
    base_dir = _base_index(spark, [(d, _png(d)) for d in range(3)])
    _write_days(
        src,
        [("mixed.jsonl", [_jrow(1000, 1, _png(3)), _jrow(2000, 2, _png(6))])],
    )
    with pytest.raises(Exception, match="spans days"):
        media_assimilate_stream(spark, src, base_dir, vdir, timeout=60)


def test_ann_bridge_matches_batch_lifecycle(spark, index_root, tmp_path):
    """ann_assimilate_stream: day 2's search rows equal the hand-run
    batch composition (assimilate day 1, then ivfpq_search_vectors on
    the grown generation), the chain grows one generation per batch,
    and every batch vector is searchable afterwards."""
    import json

    from mycenae_spark.functions import pq
    from mycenae_spark.registry.util import r6
    from mycenae_spark.sources.tables import load_table
    from mycenae_spark.streaming.assimilate import (
        ANN_RESULT_SCHEMA,
        ann_assimilate_stream,
    )

    e = load_table(spark, SF_DIR, "embeddings")
    base_pred = ~((F.col("vec_id") % 20).isin(2, 3))
    base_dir = pq.ensure_ivfpq_index(
        spark, SF_DIR, rounder=r6, pred=base_pred, pred_desc="mod20ne23"
    )

    src = str(tmp_path / "src")
    rdir = str(tmp_path / "results")
    slices = {}
    files = []
    for day, mod in ((1, 2), (2, 3)):
        rows = (
            e.filter((F.col("vec_id") % 20 == mod) & (F.col("vec_id") < 500))
            .select("vec_id", "embedding")
            .collect()
        )
        slices[day] = rows
        files.append((
            f"day{day}.jsonl",
            [json.dumps({"vec_id": r["vec_id"], "day": day,
                         "embedding": list(r["embedding"])}) for r in rows],
        ))
    _write_days(src, files)

    chain = ann_assimilate_stream(
        spark, src, base_dir, rdir, rounder=r6, k=3, nprobe=8
    )
    assert len(chain) == 3 and chain[0] == base_dir

    res = read_bridge_output(spark, rdir, ANN_RESULT_SCHEMA)
    got_d2 = {
        (r["q_id"], r["n_id"], r["rk"], r["cos_r"])
        for r in res.filter("day = 2").collect()
    }

    # hand-run the batch verbs: assimilate day 1, search day 2 on gen 1
    grown = pq.assimilate_ivfpq_index(
        spark, base_dir,
        spark.createDataFrame(slices[1], e.select("vec_id", "embedding").schema),
        rounder=r6,
    )
    assert grown == chain[1]  # same delta content -> same committed dir
    unitv, cb, codes, cent = pq.load_ivfpq_index(spark, grown)
    hand = pq.ivfpq_search_vectors(
        unitv, cb, codes, cent,
        spark.createDataFrame(slices[2], e.select("vec_id", "embedding").schema),
        r6, nprobe=8, k=3,
    )
    assert got_d2 == {
        (r["q_id"], r["n_id"], r["rk"], r["cos_r"]) for r in hand.collect()
    }
    # every streamed query got k rows against a non-trivial index
    n_q = len(slices[1]) + len(slices[2])
    assert res.count() == 3 * n_q


def test_bridge_checkpoint_restart(spark, index_root, tmp_path):
    """Operational restart: day 1 drains with a source checkpoint; the
    job 'comes back tomorrow' (same checkpoint + output dir) after day
    2's file lands.  The recovered chain means day 2 probes day 1's
    generation — and day 1's verdicts are not reprocessed or
    duplicated."""
    src = str(tmp_path / "src")
    vdir = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")
    base_dir = _base_index(spark, [(d, _png(d)) for d in range(6)])

    _write_days(
        src, [("day1.jsonl", [_jrow(1000 + d, 1, _png(d)) for d in (6, 7, 8)])]
    )
    chain1 = media_assimilate_stream(
        spark, src, base_dir, vdir, checkpoint_dir=ckpt
    )
    assert len(chain1) == 2

    # tomorrow: day 2 lands — a re-encode of a day-1 keep plus one new
    _write_days(
        src,
        [
            ("day1.jsonl", [_jrow(1000 + d, 1, _png(d)) for d in (6, 7, 8)]),
            ("day2.jsonl", [_jrow(2000, 2, _gif(6)), _jrow(2001, 2, _png(9))]),
        ],
    )
    chain2 = media_assimilate_stream(
        spark, src, base_dir, vdir, checkpoint_dir=ckpt
    )
    assert chain2[:2] == chain1 and len(chain2) == 3

    v = read_bridge_output(spark, vdir, VERDICT_SCHEMA)
    assert v.count() == 5  # 3 day-1 rows (not duplicated) + 2 day-2 rows
    got = {r["media_id"]: (r["dup_of"], r["is_dup"]) for r in v.collect()}
    assert got[2000] == (1006, 1)  # caught via the RECOVERED chain
    assert got[2001] == (-1, 0)


def test_bridge_full_replay_idempotent(spark, index_root, tmp_path):
    """At-least-once honesty: re-running the whole backlog over the same
    output dir (no checkpoint → every batch replays) rewrites
    byte-identical verdicts against each day's ORIGINAL pre-state and
    leaves the chain unchanged — a replayed day must not see its own
    keeps in the index it probes."""
    src = str(tmp_path / "src")
    vdir = str(tmp_path / "verdicts")
    base_dir = _base_index(spark, [(d, _png(d)) for d in range(6)])
    _write_days(
        src,
        [
            ("day1.jsonl", [_jrow(1000 + d, 1, _png(d)) for d in (6, 7, 8)]),
            ("day2.jsonl", [_jrow(2000, 2, _gif(6)), _jrow(2001, 2, _png(9))]),
        ],
    )
    chain1 = media_assimilate_stream(spark, src, base_dir, vdir)
    rows1 = sorted(
        tuple(r) for r in read_bridge_output(
            spark, vdir, VERDICT_SCHEMA).collect()
    )
    chain2 = media_assimilate_stream(spark, src, base_dir, vdir)
    rows2 = sorted(
        tuple(r) for r in read_bridge_output(
            spark, vdir, VERDICT_SCHEMA).collect()
    )
    assert chain2 == chain1
    assert rows2 == rows1
    # specifically: the day-1 keeps are still keeps on replay (they WOULD
    # be self-dups if the replay probed the grown chain head)
    got = {r[0]: r[4] for r in rows2}  # media_id -> is_dup
    assert got[1006] == 0 and got[1007] == 0 and got[1008] == 0


def test_text_bridge_matches_batch_lifecycle(spark, index_root, tmp_path):
    """text_assimilate_stream: day 2 catches an exact-text retransmit of
    a day-1 KEEP (cross-batch assimilation at the minhash band index),
    and the final generation answers like a from-scratch rebuild over
    base ∪ keeps."""
    from mycenae_spark.streaming.assimilate import (
        TEXT_VERDICT_SCHEMA,
        text_assimilate_stream,
    )

    def text(i):
        return f"doc {i} token stream " + " ".join(
            f"w{i}p{j}" for j in range(12)
        )

    src = str(tmp_path / "src")
    vdir = str(tmp_path / "verdicts")
    day0 = spark.createDataFrame(
        [(i, text(i)) for i in range(4)], "doc_id long, text string"
    )
    base_dir = dedup.ensure_band_index(
        spark, SF_DIR, day0, "doc_id", "text",
        pred_desc="text-bridge-test", n_bands=4, max_bucket_size=512,
    )
    _write_days(
        src,
        [
            ("day1.jsonl", [
                json.dumps({"doc_id": 1000, "day": 1, "text": text(0)}),
                json.dumps({"doc_id": 1004, "day": 1, "text": text(4)}),
            ]),
            ("day2.jsonl", [
                json.dumps({"doc_id": 2004, "day": 2, "text": text(4)}),
                json.dumps({"doc_id": 2005, "day": 2, "text": text(5)}),
            ]),
        ],
    )
    chain = text_assimilate_stream(spark, src, base_dir, vdir)
    assert len(chain) == 3 and chain[0] == base_dir

    v = read_bridge_output(spark, vdir, TEXT_VERDICT_SCHEMA)
    got = {r["doc_id"]: (r["day"], r["dup_of"], r["is_dup"])
           for r in v.collect()}
    assert got[1000] == (1, 0, 1)     # retransmit of base doc 0
    assert got[1004] == (1, -1, 0)    # new -> keep, assimilated
    assert got[2004] == (2, 1004, 1)  # caught ONLY via assimilation
    assert got[2005] == (2, -1, 0)

    # final generation == rebuild from scratch over base ∪ keeps
    rebuilt = dedup.ensure_band_index(
        spark, SF_DIR,
        day0.unionByName(spark.createDataFrame(
            [(1004, text(4)), (2005, text(5))], "doc_id long, text string"
        )),
        "doc_id", "text",
        pred_desc="text-bridge-union", n_bands=4, max_bucket_size=512,
    )
    probes = spark.createDataFrame(
        [(9000 + i, text(i)) for i in (0, 4, 5, 7)],
        "doc_id long, text string",
    )

    def verdicts(d):
        return {
            (r["doc_id"], r["dup_of"], r["is_dup"])
            for r in dedup.probe_band_index(
                spark, d, probes, "doc_id", "text", n_bands=4
            ).collect()
        }

    assert verdicts(chain[-1]) == verdicts(rebuilt)


def test_bridge_same_day_new_content_refuses(spark, index_root, tmp_path):
    """A SECOND file tagged with an already-chained day but carrying
    different content is not a replay: continuing would fork the chain
    off the pre-day state (dropping the first file's keeps from the
    head) and clobber its verdict rows — the bridge must refuse loudly
    (review finding r16s2)."""
    src = str(tmp_path / "src")
    vdir = str(tmp_path / "verdicts")
    base_dir = _base_index(spark, [(d, _png(d)) for d in range(3)])
    _write_days(src, [("day1a.jsonl", [_jrow(1000, 1, _png(3))])])
    chain = media_assimilate_stream(spark, src, base_dir, vdir)
    assert len(chain) == 2
    # an intraday top-up mis-tagged with the same day
    _write_days(
        src,
        [
            ("day1a.jsonl", [_jrow(1000, 1, _png(3))]),
            ("day1b.jsonl", [_jrow(1001, 1, _png(4))]),
        ],
    )
    with pytest.raises(Exception, match="DIFFERENT content"):
        media_assimilate_stream(spark, src, base_dir, vdir, timeout=120)
    # the original day-1 verdicts were not clobbered
    v = read_bridge_output(spark, vdir, VERDICT_SCHEMA)
    assert [r["media_id"] for r in v.collect()] == [1000]


def test_bridge_all_dup_day_replay_idempotent(spark, index_root, tmp_path):
    """Replay of a day that produced NO generation: the manifest records
    no-generation days too, so the replayed day still probes its true
    pre-day state instead of the post-state head (which by then holds a
    later day's keeps) — verdicts must come out byte-identical (review
    finding r16s2)."""
    src = str(tmp_path / "src")
    vdir = str(tmp_path / "verdicts")
    base_dir = _base_index(spark, [(d, _png(d)) for d in range(6)])
    _write_days(
        src,
        [
            # day 1: all-dup (GIF re-encode of a base triple) -> no gen
            ("day1.jsonl", [_jrow(1000, 1, _gif(0))]),
            # day 2: a keep that the day-1 replay must NOT see
            ("day2.jsonl", [_jrow(2000, 2, _png(6))]),
            # day 3: dup of day 2's keep (needs the day-2 generation)
            ("day3.jsonl", [_jrow(3000, 3, _gif(6))]),
        ],
    )
    chain1 = media_assimilate_stream(spark, src, base_dir, vdir)
    rows1 = sorted(
        tuple(r)
        for r in read_bridge_output(spark, vdir, VERDICT_SCHEMA).collect()
    )
    chain2 = media_assimilate_stream(spark, src, base_dir, vdir)
    rows2 = sorted(
        tuple(r)
        for r in read_bridge_output(spark, vdir, VERDICT_SCHEMA).collect()
    )
    assert chain2 == chain1 and len(chain1) == 2  # only day 2 grew it
    assert rows2 == rows1
    got = {r[0]: (r[2], r[4]) for r in rows2}  # id -> (dup_of, is_dup)
    assert got[1000] == (0, 1)
    assert got[2000] == (-1, 0)
    assert got[3000] == (2000, 1)  # via day-2's generation


def test_bridge_writer_lock_enforced_and_crash_released(
    spark, index_root, tmp_path
):
    """An output dir has exactly one writer (r16 ADVICE — interleaved
    manifest saves would fork the chain): a HELD kernel flock refuses a
    second run; a lock file left behind by a crashed run does NOT block
    (the kernel released its flock at process death — there is no
    userspace staleness protocol to get wrong, third review pass
    r17)."""
    import fcntl

    src = str(tmp_path / "src")
    vdir = tmp_path / "verdicts"
    base_dir = _base_index(spark, [(d, _png(d)) for d in range(3)])
    _write_days(src, [("day1.jsonl", [_jrow(1000, 1, _png(3))])])

    vdir.mkdir()
    lock = vdir / "_chain.json.lock"
    fd = os.open(str(lock), os.O_CREAT | os.O_RDWR)
    fcntl.flock(fd, fcntl.LOCK_EX)  # a live concurrent writer
    os.write(fd, str(os.getpid()).encode())
    with pytest.raises(RuntimeError, match="locked by a live"):
        media_assimilate_stream(spark, src, base_dir, str(vdir))

    os.close(fd)  # the "crash": the kernel releases the flock
    chain = media_assimilate_stream(spark, src, base_dir, str(vdir))
    assert len(chain) == 2
    assert lock.exists()  # the file remains; flock state is authority


def test_read_bridge_output_skips_unpublished_days(spark, tmp_path):
    """Published = any non-``.tmp.`` day dir with parquet part files (or
    a bare ``_SUCCESS`` for a committed empty day): a day-staging
    ``.tmp.`` dir (bridge mid-write or crashed) and a dir with neither
    are invisible; a day whose ``_SUCCESS`` is absent (object-store
    committers with marksuccessfuljobs=false, r17 ADVICE) stays
    readable — publish atomicity comes from the whole-dir rename, not
    the marker."""
    vdir = tmp_path / "verdicts"
    spark.createDataFrame(
        [(1, 1, -1, 0, 0)], VERDICT_SCHEMA
    ).coalesce(1).write.parquet(str(vdir / "batch_1"))
    spark.createDataFrame(
        [(2, 2, -1, 0, 0)], VERDICT_SCHEMA
    ).coalesce(1).write.parquet(str(vdir / "batch_2.tmp.999"))
    spark.createDataFrame(
        [(3, 3, -1, 0, 0)], VERDICT_SCHEMA
    ).coalesce(1).write.parquet(str(vdir / "batch_3"))
    os.remove(str(vdir / "batch_3" / "_SUCCESS"))  # marker disabled
    (vdir / "batch_4").mkdir()  # neither parquet nor marker: torn
    (vdir / "batch_5").mkdir()  # committed EMPTY day: marker only
    (vdir / "batch_5" / "_SUCCESS").touch()
    v = read_bridge_output(spark, str(vdir), VERDICT_SCHEMA)
    assert sorted(r["media_id"] for r in v.collect()) == [1, 3]


def test_ann_replay_compare_tolerates_float_noise(spark):
    """The ANN family's replay-equality test: identical neighbor
    identity with cos_r differing at float-rounding magnitude (≤1e-6)
    is a legitimate replay on a resized cluster, NOT a fork; a real
    value change or an identity change still refuses (r16 ADVICE)."""
    from mycenae_spark.streaming.assimilate import (
        ANN_RESULT_SCHEMA,
        _ann_results_differ,
    )

    stored = spark.createDataFrame(
        [(1, 10, 20, 1, 0.9000001), (1, 10, 21, 2, 0.8)], ANN_RESULT_SCHEMA
    )
    noise = spark.createDataFrame(
        [(1, 10, 20, 1, 0.9000004), (1, 10, 21, 2, 0.8)], ANN_RESULT_SCHEMA
    )
    real_change = spark.createDataFrame(
        [(1, 10, 20, 1, 0.91), (1, 10, 21, 2, 0.8)], ANN_RESULT_SCHEMA
    )
    flipped_id = spark.createDataFrame(
        [(1, 10, 22, 1, 0.9000001), (1, 10, 21, 2, 0.8)], ANN_RESULT_SCHEMA
    )
    assert not _ann_results_differ(stored, stored)
    assert not _ann_results_differ(stored, noise)
    assert _ann_results_differ(stored, real_change)
    assert _ann_results_differ(stored, flipped_id)


def test_chain_survives_gc_then_rebases_onto_compacted_head(
    spark, index_root, tmp_path
):
    """Chain lifetime management end to end (r16 VERDICT #1):
    (1) a week-idle chain SURVIVES the GC — the manifest registry
    protects every referenced generation even though daily use only
    touches the head; (2) rebase_bridge_chain adopts a compacted head,
    the released generations age out and ARE swept, the new base is
    protected; (3) the bridge continues on the rebased chain with
    identical dup semantics; (4) a redelivered pre-horizon day refuses
    loudly instead of forking the rebased chain."""
    import time

    from mycenae_spark.functions import pq
    from mycenae_spark.streaming.assimilate import rebase_bridge_chain

    src = str(tmp_path / "src")
    vdir = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")
    base_dir = _base_index(spark, [(d, _png(d)) for d in range(6)])
    day1 = [_jrow(1000 + d, 1, _png(d)) for d in (6, 7)]
    day2 = [_jrow(2000, 2, _png(9))]
    _write_days(src, [("day1.jsonl", day1), ("day2.jsonl", day2)])
    chain = media_assimilate_stream(
        spark, src, base_dir, vdir, checkpoint_dir=ckpt
    )
    assert len(chain) == 3

    def age_everything():
        old = time.time() - 9 * 24 * 3600
        for name in os.listdir(str(index_root)):
            os.utime(os.path.join(str(index_root), name), (old, old))

    # (1) the whole chain goes idle past the GC window: nothing swept
    age_everything()
    assert pq.gc_pq_indexes() == []
    assert all(os.path.isdir(d) for d in chain)
    # and the bridge still recovers the manifest intact
    assert media_assimilate_stream(
        spark, src, base_dir, vdir, checkpoint_dir=ckpt
    ) == chain

    # (2) compact the head, rebase, and NOW the old generations release
    compacted = dedup.compact_sig_index(spark, chain[-1])
    st = rebase_bridge_chain(vdir, compacted, expect_head=chain[-1])
    assert st["base"] == compacted and st["horizon_days"] == [1, 2]
    age_everything()
    removed = set(pq.gc_pq_indexes())
    assert set(chain) <= removed          # base + both generations freed
    assert os.path.isdir(compacted)       # the new base is protected

    # expect_head guards a stale rebase (head moved since compaction)
    with pytest.raises(ValueError, match="re-run compaction"):
        rebase_bridge_chain(vdir, compacted, expect_head=chain[-1])

    # (3) day 3 continues on the rebased chain: a re-encode of a DAY-1
    # keep is still a dup — the compacted head carries the whole corpus
    day3 = [_jrow(3000, 3, _gif(6)), _jrow(3001, 3, _png(12))]
    _write_days(
        src,
        [("day1.jsonl", day1), ("day2.jsonl", day2), ("day3.jsonl", day3)],
    )
    chain2 = media_assimilate_stream(
        spark, src, compacted, vdir, checkpoint_dir=ckpt
    )
    assert chain2[0] == compacted and len(chain2) == 2
    v = read_bridge_output(spark, vdir, VERDICT_SCHEMA)
    got = {r["media_id"]: (r["dup_of"], r["is_dup"])
           for r in v.filter("day = 3").collect()}
    assert got[3000] == (1006, 1) and got[3001] == (-1, 0)

    # (4) a from-scratch backlog replay (lost checkpoint) redelivers a
    # pre-horizon day: refuse loudly, never fork the rebased chain
    with pytest.raises(Exception, match="rebase horizon"):
        media_assimilate_stream(spark, src, compacted, vdir, timeout=120)


def test_prune_bridge_output_retention(spark, index_root, tmp_path):
    """Verdict-lake retention (the output-side twin of chain lifetime):
    prune_bridge_output deletes all but the newest N processed days'
    result dirs, readers serve only the retained days, the bridge keeps
    ingesting new days on its checkpoint — with the CHAIN fully intact
    (a dup of a pruned day's keep is still caught) — and a redelivered
    pruned day refuses loudly instead of forking."""
    from mycenae_spark.streaming.assimilate import prune_bridge_output

    src = str(tmp_path / "src")
    vdir = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")
    base_dir = _base_index(spark, [(d, _png(d)) for d in range(6)])
    days = [
        ("d1.jsonl", [_jrow(1000 + d, 1, _png(d)) for d in (6, 7)]),
        ("d2.jsonl", [_jrow(2000, 2, _png(9))]),
        ("d3.jsonl", [_jrow(3000, 3, _png(12))]),
    ]
    _write_days(src, days)
    media_assimilate_stream(spark, src, base_dir, vdir, checkpoint_dir=ckpt)

    with pytest.raises(ValueError, match="keep_last"):
        prune_bridge_output(vdir, 0)
    out = prune_bridge_output(vdir, keep_last=1)
    assert out == {"pruned": [1, 2], "kept": [3]}
    v = read_bridge_output(spark, vdir, VERDICT_SCHEMA)
    assert {r["day"] for r in v.collect()} == {3}
    # idempotent
    assert prune_bridge_output(vdir, keep_last=1) == {
        "pruned": [], "kept": [3]
    }

    # day 4 continues on the checkpoint; the chain is intact — a GIF
    # re-encode of PRUNED day 1's keep is still a dup of id 1006
    _write_days(src, days + [
        ("d4.jsonl", [_jrow(4000, 4, _gif(6)), _jrow(4001, 4, _png(15))]),
    ])
    media_assimilate_stream(spark, src, base_dir, vdir, checkpoint_dir=ckpt)
    got = {
        r["media_id"]: (r["day"], r["dup_of"], r["is_dup"])
        for r in read_bridge_output(spark, vdir, VERDICT_SCHEMA).collect()
    }
    assert set(got) == {3000, 4000, 4001}
    assert got[4000] == (4, 1006, 1)
    assert got[4001] == (4, -1, 0)

    # a lost-checkpoint backlog replay redelivers pruned day 1: refuse
    with pytest.raises(Exception, match="pruned"):
        media_assimilate_stream(spark, src, base_dir, vdir, timeout=120)


def test_prune_keeps_processing_order_not_day_labels(
    spark, index_root, tmp_path
):
    """keep_last protects the most recently PROCESSED days — the ones
    an in-flight crash can redeliver — not the largest day labels: a
    late backfill file carries a SMALLER day than an earlier batch, and
    pruning it instead of the older-processed day would wedge the
    bridge on its own restart (second review pass r17)."""
    from mycenae_spark.streaming.assimilate import prune_bridge_output

    src = str(tmp_path / "src")
    vdir = str(tmp_path / "verdicts")
    base_dir = _base_index(spark, [(d, _png(d)) for d in range(6)])
    # processing order: day 5 FIRST, then the day-3 backfill
    _write_days(src, [
        ("d5.jsonl", [_jrow(5000, 5, _png(6))]),
        ("d3.jsonl", [_jrow(3000, 3, _png(9))]),
    ])
    media_assimilate_stream(spark, src, base_dir, vdir)
    out = prune_bridge_output(vdir, keep_last=1)
    assert out == {"pruned": [5], "kept": [3]}  # 3 was processed LAST
    v = read_bridge_output(spark, vdir, VERDICT_SCHEMA)
    assert {r["day"] for r in v.collect()} == {3}


def test_rebase_preserves_retention_accounting(spark, index_root, tmp_path):
    """pruned_days must survive a rebase: without carrying it forward,
    a later prune re-reports already-deleted days as kept or freshly
    pruned (second review pass r17)."""
    from mycenae_spark.functions.dedup import compact_sig_index
    from mycenae_spark.streaming.assimilate import (
        prune_bridge_output,
        rebase_bridge_chain,
    )

    src = str(tmp_path / "src")
    vdir = str(tmp_path / "verdicts")
    base_dir = _base_index(spark, [(d, _png(d)) for d in range(6)])
    _write_days(src, [
        ("d1.jsonl", [_jrow(1000, 1, _png(6))]),
        ("d2.jsonl", [_jrow(2000, 2, _png(9))]),
        ("d3.jsonl", [_jrow(3000, 3, _png(12))]),
    ])
    chain = media_assimilate_stream(spark, src, base_dir, vdir)
    assert prune_bridge_output(vdir, keep_last=2) == {
        "pruned": [1], "kept": [2, 3]
    }
    rebase_bridge_chain(
        vdir, compact_sig_index(spark, chain[-1]), expect_head=chain[-1]
    )
    # day 1 is deleted history, not retained — and not "freshly pruned"
    assert prune_bridge_output(vdir, keep_last=3) == {
        "pruned": [], "kept": [2, 3]
    }
    assert prune_bridge_output(vdir, keep_last=1) == {
        "pruned": [2], "kept": [3]
    }


def test_bridge_null_day_refuses(spark, index_root, tmp_path):
    """A crawl file whose rows lack the day field reads as null days —
    silently treating it as empty would commit the source checkpoint
    past real data, so the bridge refuses (review finding r16s2)."""
    import json as _json

    src = str(tmp_path / "src")
    vdir = str(tmp_path / "verdicts")
    base_dir = _base_index(spark, [(d, _png(d)) for d in range(3)])
    _write_days(
        src,
        [("bad.jsonl", [_json.dumps({"media_id": 1, "payload_b64": "aGk="})])],
    )
    with pytest.raises(Exception, match="null 'day'"):
        media_assimilate_stream(spark, src, base_dir, vdir, timeout=120)


def test_prune_reclaims_crash_orphaned_days(spark, index_root, tmp_path):
    """Crash-safety of the prune itself (r17 ADVICE): a crash between
    the manifest save and the deletes leaves days marked pruned but
    still on disk — the NEXT prune call must reclaim them even when it
    prunes nothing new, or they leak (readable forever while their
    replay refuses as pruned)."""
    from mycenae_spark.streaming.assimilate import prune_bridge_output

    src = str(tmp_path / "src")
    vdir = str(tmp_path / "verdicts")
    base_dir = _base_index(spark, [(d, _png(d)) for d in range(6)])
    _write_days(src, [
        ("d1.jsonl", [_jrow(1000, 1, _png(6))]),
        ("d2.jsonl", [_jrow(2000, 2, _png(9))]),
        ("d3.jsonl", [_jrow(3000, 3, _png(12))]),
    ])
    media_assimilate_stream(spark, src, base_dir, vdir)
    assert prune_bridge_output(vdir, keep_last=1)["pruned"] == [1, 2]
    # Simulate the crash orphan: a marked-pruned day's dir reappears
    # (equivalently: the original prune died after _save_state).
    orphan = os.path.join(vdir, "batch_1")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "_SUCCESS"), "w"):
        pass
    out = prune_bridge_output(vdir, keep_last=1)
    assert out == {"pruned": [], "kept": [3]}  # nothing NEW pruned...
    assert not os.path.exists(orphan)          # ...orphan still swept


def test_chain_protection_fails_closed_on_torn_registry(
    spark, index_root, tmp_path
):
    """chain_protected_dirs (r17 ADVICE): a genuinely-absent manifest is
    a dead chain (skipped), but an unreadable one must ABORT the sweep —
    manifest saves are atomic, so a decode error is real corruption, and
    sweeping without full protection knowledge deletes live mid-chain
    generations."""
    from mycenae_spark.functions import pq

    src = str(tmp_path / "src")
    vdir = str(tmp_path / "verdicts")
    base_dir = _base_index(spark, [(d, _png(d)) for d in range(3)])
    _write_days(src, [("d1.jsonl", [_jrow(1000, 1, _png(4))])])
    chain = media_assimilate_stream(spark, src, base_dir, vdir)
    assert set(chain) <= pq.chain_protected_dirs()

    # dead chain: out_dir (and manifest) gone entirely -> skipped
    import shutil

    shutil.rmtree(vdir)
    assert pq.chain_protected_dirs() == set()

    # torn manifest: registry points at a dir whose _chain.json is
    # unparseable -> the sweep must refuse, not silently unprotect
    os.makedirs(vdir)
    with open(os.path.join(vdir, "_chain.json"), "w") as fh:
        fh.write("{ not json")
    with pytest.raises(RuntimeError, match="chain protection"):
        pq.chain_protected_dirs()
    with pytest.raises(RuntimeError, match="chain protection"):
        pq.gc_pq_indexes()


def test_ann_replay_compare_checks_multiplicity_and_nulls(spark):
    """_ann_results_differ aggregates per key before joining (r17
    ADVICE): a duplicated (day,q_id,n_id,rk) row on one side is a real
    difference a raw key join would hide; matching all-null cos_r keys
    compare equal; a null-vs-value flip refuses."""
    from mycenae_spark.streaming.assimilate import (
        ANN_RESULT_SCHEMA,
        _ann_results_differ,
    )

    one = spark.createDataFrame([(1, 10, 20, 1, 0.9)], ANN_RESULT_SCHEMA)
    doubled = spark.createDataFrame(
        [(1, 10, 20, 1, 0.9), (1, 10, 20, 1, 0.9)], ANN_RESULT_SCHEMA
    )
    null_a = spark.createDataFrame([(1, 10, 20, 1, None)], ANN_RESULT_SCHEMA)
    null_b = spark.createDataFrame([(1, 10, 20, 1, None)], ANN_RESULT_SCHEMA)
    assert _ann_results_differ(one, doubled)
    assert _ann_results_differ(doubled, one)
    assert not _ann_results_differ(null_a, null_b)   # both legitimately null
    assert _ann_results_differ(one, null_a)          # value -> null refuses
