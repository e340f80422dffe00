"""Multimodal plumbing tests: schema, Arrow batching, row expansion —
deterministic fake decode (codecs are stubbed in this environment)."""

from __future__ import annotations

import pytest

from mycenae_spark.functions.multimodal import (
    FEATURES_SCHEMA,
    MEDIA_SCHEMA,
    decode_media,
    sample_frames,
)


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", b"\x89PNG" + b"x" * 100, "image/png"),
        (2, "video", b"\x00\x00ftyp" + b"y" * 5000, "video/mp4"),
        (3, "audio", b"RIFF" + b"z" * 300, "audio/wav"),
        (4, "image", None, None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_stub_schema_and_determinism(media):
    out = decode_media(media)
    assert out.schema == FEATURES_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 4
    assert rows[1]["n_bytes"] == 104
    assert rows[4]["n_bytes"] == 0
    # running twice gives identical checksums (deterministic kernel)
    again = {r["media_id"]: r["checksum"] for r in decode_media(media).collect()}
    assert again == {k: v["checksum"] for k, v in rows.items()}


def test_decode_real_path_raises(media):
    with pytest.raises(Exception) as ei:
        decode_media(media, decode_stub=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_custom_kernel_and_bucketing(media):
    import pandas as pd

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["media_id", "kind"]].copy()
        out["n_bytes"] = pdf["payload"].map(lambda b: 0 if b is None else len(b))
        out["width"] = 0
        out["height"] = 0
        out["n_frames"] = 1
        out["checksum"] = "k"
        return out.astype(
            {"n_bytes": "int64", "width": "int32", "height": "int32",
             "n_frames": "int32"}
        )

    out = decode_media(media, kernel=kernel, shuffle_buckets=2)
    assert out.count() == 4
    assert out.rdd.getNumPartitions() == 2


def test_frame_sampling_expansion(media):
    frames = sample_frames(media, every_n=5)
    rows = frames.collect()
    assert all(r["media_id"] == 2 for r in rows)  # only the video row expands
    assert [r["frame_idx"] for r in rows] == sorted(r["frame_idx"] for r in rows)


def test_rechunk_bounds_batch_bytes_under_skew(spark):
    """Skewed media sizes: each kernel invocation sees at most
    max_batch_bytes of payload (an oversized single row is the only
    exception — it is yielded alone)."""
    import pandas as pd

    from mycenae_spark.functions.multimodal import rechunk_by_bytes

    # One partition so Arrow hands the kernel large multi-row batches.
    sizes = [100, 200, 5000, 50, 7000, 10, 10, 9000, 3000, 3000, 3000]
    rows = [(i, "video", b"v" * s, "video/mp4") for i, s in enumerate(sizes)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(1)
    cap = 4096

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        batch_bytes = int(pdf["payload"].map(len).sum())
        out = pdf[["media_id", "kind"]].copy()
        out["n_bytes"] = pdf["payload"].map(len).astype("int64")
        # smuggle the observed per-invocation totals out through the rows
        out["width"] = batch_bytes if batch_bytes <= 2**31 - 1 else -1
        out["height"] = len(pdf)
        out["n_frames"] = 1
        out["checksum"] = ""
        return out.astype(
            {"n_bytes": "int64", "width": "int32", "height": "int32",
             "n_frames": "int32"}
        )

    out = decode_media(media, kernel=kernel, max_batch_bytes=cap).collect()
    assert len(out) == len(sizes)
    assert sorted(r["n_bytes"] for r in out) == sorted(sizes)
    for r in out:
        # bound holds unless the row itself exceeds the budget
        assert r["width"] <= cap or r["width"] == r["n_bytes"], (
            r["media_id"], r["width"], r["n_bytes"])
    # the skewed rows actually forced a split (>1 invocation)
    assert len({(r["width"], r["height"]) for r in out}) > 1


def test_rechunk_pure_iterator_shapes():
    """Unit check of the greedy packer: consecutive packing, oversized row
    isolated, empty frames passed through."""
    import pandas as pd

    from mycenae_spark.functions.multimodal import rechunk_by_bytes

    pdf = pd.DataFrame({"payload": [b"a" * 10, b"a" * 10, b"a" * 25, b"a" * 5, None]})
    chunks = list(rechunk_by_bytes(iter([pdf]), max_batch_bytes=20))
    assert [len(c) for c in chunks] == [2, 1, 2]
    assert [int(c["payload"].map(lambda b: 0 if b is None else len(b)).sum())
            for c in chunks] == [20, 25, 5]
    assert list(rechunk_by_bytes(iter([pdf.iloc[:0]]), 20))[0].empty


def test_multimodal_media_stats_judged_query(spark):
    """The judged rows-only query drives the full Arrow path on real
    testdata and returns one deterministic row per media kind."""
    from mycenae_spark.registry.llm_queries import multimodal_media_stats

    from tests.conftest import SF_DIR

    rows = multimodal_media_stats(spark, SF_DIR).collect()
    kinds = [r["kind"] for r in rows]
    assert kinds == sorted(kinds) and set(kinds) == {"image", "audio", "video"}
    assert all(r["n_items"] > 0 and r["total_bytes"] > 0 for r in rows)
    # deterministic across runs (stub kernel is pure)
    again = multimodal_media_stats(spark, SF_DIR).collect()
    assert rows == again
