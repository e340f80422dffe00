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


def test_decode_real_path_and_resize_mixed_corpus(media):
    """Since r12 decode_stub=False RUNS (real header parsing): opaque
    payloads yield null dims, never an exception.  Since r13 pixel-level
    resize is REAL for non-interlaced 8-bit PNG; r14 made the non-PNG
    policy null-and-continue (one JPEG must not kill a mixed corpus) —
    this covers BOTH branches: a real PNG resizes with exact geometry
    and a checksum of the RESIZED buffer, non-PNGs yield null rows."""
    import hashlib

    import numpy as np

    from mycenae_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        encode_png,
        resize_media,
    )

    rows = decode_media(media, decode_stub=False).collect()
    assert len(rows) == 4  # runs; the fake payloads parse to null dims
    assert all(r["width"] is None for r in rows)

    # mixed corpus: one real 20×10 PNG + the fake payloads
    px = (np.arange(10)[:, None] * 7 + np.arange(20)[None, :] * 3) % 256
    png = encode_png(px.astype(np.uint8), 0, row_filters=lambda y: y % 5)
    spark = media.sparkSession
    mixed = media.union(
        spark.createDataFrame([(9, "image", png, "image/png")], MEDIA_SCHEMA)
    )
    out = {r["media_id"]: r for r in
           resize_media(mixed, 8, 8, decode_stub=False).collect()}
    assert len(out) == 5
    for mid in (1, 2, 3, 4):  # non-PNG → null row, never a raise
        assert out[mid]["out_w"] is None and out[mid]["checksum"] is None
    r = out[9]
    assert (r["in_w"], r["in_h"], r["out_w"], r["out_h"]) == (20, 10, 8, 4)
    res = px.astype(np.uint8)[np.ix_([0, 2, 5, 7],
                                     [0, 2, 5, 7, 10, 12, 15, 17])]
    assert r["checksum"] == hashlib.md5(res.tobytes()).hexdigest()
    assert r["out_bytes"] == res.size


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


def test_parse_image_header_exact_and_malformed():
    """parse_image_header: exact struct reads per container spec, honest
    Nones on truncation/desync/unknown magic — the pure-Python real
    decode (r11 VERDICT item 4)."""
    import struct

    from mycenae_spark.functions.multimodal import parse_image_header

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00")
    assert parse_image_header(png) == ("png", 640, 480)
    # truncated IHDR: format known, dims not
    assert parse_image_header(png[:20]) == ("png", None, None)
    # wrong first chunk type
    bad = png[:12] + b"IDAT" + png[16:]
    assert parse_image_header(bad) == ("png", None, None)

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\xf7"
    assert parse_image_header(gif) == ("gif", 320, 200)
    assert parse_image_header(b"GIF87a" + struct.pack("<HH", 1, 2)) == (
        "gif", 1, 2)
    assert parse_image_header(b"GIF89a\x01") == ("gif", None, None)

    # JPEG: APP0 + a COM segment + a restart marker must all be walked
    jpeg = (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
            + b"\xff\xfe" + struct.pack(">H", 5) + b"abc"
            + b"\xff\xd0"  # standalone RST0: no length field
            + b"\xff\xc2" + struct.pack(">H", 8) + b"\x08"
            + struct.pack(">HH", 480, 640) + b"\x03")
    assert parse_image_header(jpeg) == ("jpeg", 640, 480)
    # desync (non-FF where a marker must be)
    assert parse_image_header(b"\xff\xd8\x00\xc0") == ("jpeg", None, None)
    # truncated before any SOF
    assert parse_image_header(b"\xff\xd8\xff\xe0\x00\x10") == (
        "jpeg", None, None)
    # zero segment length cannot advance: malformed, not an infinite loop
    assert parse_image_header(b"\xff\xd8\xff\xe0\x00\x00rest") == (
        "jpeg", None, None)

    assert parse_image_header(None) == (None, None, None)
    assert parse_image_header(b"") == (None, None, None)
    assert parse_image_header(b"plain text bytes") == (None, None, None)


def test_decode_media_real_kernel_through_arrow(spark):
    """decode_stub=False runs the REAL header kernel end-to-end through
    mapInPandas: parsed dims for valid containers, nulls for opaque
    payloads, exact n_bytes/md5 for both."""
    import hashlib
    import struct

    from mycenae_spark.functions.multimodal import decode_media

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 12, 34) + b"\x08\x02\x00\x00\x00")
    rows = [(1, "image", png, "image/png"),
            (2, "image", b"not an image", "application/octet-stream")]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, mime string")
    out = {r["media_id"]: r for r in decode_media(
        df, decode_stub=False).collect()}
    assert (out[1]["width"], out[1]["height"]) == (12, 34)
    assert out[1]["n_bytes"] == len(png)
    assert out[1]["checksum"] == hashlib.md5(png).hexdigest()
    assert out[1]["n_frames"] is None  # honest: needs codec access
    assert out[2]["width"] is None and out[2]["height"] is None
    assert out[2]["checksum"] == hashlib.md5(b"not an image").hexdigest()


def test_parse_image_header_hardening():
    """r12 review fixes: int32-overflow dims go null instead of blowing
    up the Arrow cast; JPEG fill bytes (spec B.1.1.2) are consumed; EOI
    terminates the scan."""
    import struct

    from mycenae_spark.functions.multimodal import parse_image_header

    # corrupt IHDR carrying 0xFFFFFFFF: fmt known, dims null, no raise
    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + b"\xff\xff\xff\xff" + struct.pack(">I", 480) + b"\x08")
    assert parse_image_header(png) == ("png", None, None)
    # fill bytes before a marker are legal and must be skipped
    jpeg_fill = (b"\xff\xd8" + b"\xff"  # fill byte run
                 + b"\xff\xc0" + struct.pack(">H", 8) + b"\x08"
                 + struct.pack(">HH", 480, 640) + b"\x01")
    assert parse_image_header(jpeg_fill) == ("jpeg", 640, 480)
    # EOI with no SOF terminates — post-image bytes are never scanned
    assert parse_image_header(b"\xff\xd8\xff\xd9" + b"\xff\xc0garbage") == (
        "jpeg", None, None)


# ---------------------------------------------- real PNG pixel decode (r13)
# r14: the r13 pixel family landed dark (zero tests); this pins the whole
# matrix — every unfilter, every color-type lattice, every rejection path,
# the bounded-inflate guard, and golden dHash values.

def _chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (len(data).to_bytes(4, "big") + ctype + data
            + (zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big"))


def test_png_roundtrip_unfilter_matrix():
    """encode(filter f) → decode must recover the exact pixels for every
    filter type (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth) × every
    supported color type (gray/RGB/gray+alpha/RGBA), including mixed
    per-row filters and multi-IDAT streams."""
    import numpy as np

    from mycenae_spark.functions.multimodal import decode_png_pixels, encode_png

    rng = np.random.RandomState(14)
    for ct, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        px = rng.randint(0, 256, (11, 13, ch)).astype(np.uint8)
        for f in range(5):
            dec = decode_png_pixels(encode_png(px, ct, row_filters=f))
            assert dec is not None, (ct, f)
            assert dec[:3] == (13, 11, ch)
            assert dec[3] == px.tobytes(), f"filter {f} color {ct}"
        # mixed filters + IDAT split across 3 chunks
        dec = decode_png_pixels(
            encode_png(px, ct, row_filters=lambda y: y % 5, n_idat=3))
        assert dec is not None and dec[3] == px.tobytes()


def test_png_decode_rejections():
    """Every malformed-input path returns None (never raises): bad magic,
    CRC mismatch, truncated chunk, wrong IHDR length, interlaced, 16-bit,
    palette color, invalid filter byte, short/long pixel stream, and the
    claimed-dims guard."""
    import zlib

    import numpy as np

    from mycenae_spark.functions.multimodal import decode_png_pixels, encode_png

    px = np.arange(100, dtype=np.uint8).reshape(10, 10)
    good = encode_png(px, 0)
    assert decode_png_pixels(good)[3] == px.tobytes()

    assert decode_png_pixels(None) is None
    assert decode_png_pixels(b"") is None
    assert decode_png_pixels(b"JFIF not a png") is None
    # flip a byte inside IHDR data → CRC mismatch
    corrupt = bytearray(good)
    corrupt[16] ^= 0x01
    assert decode_png_pixels(bytes(corrupt)) is None
    # truncated INSIDE the IDAT chunk (cut 1 byte into its CRC; cutting
    # only the trailing IEND would still decode — all pixel data present)
    assert decode_png_pixels(good[: len(good) - 13]) is None

    sig = b"\x89PNG\r\n\x1a\n"

    def ihdr(w, h, depth=8, color=0, interlace=0):
        return _chunk(b"IHDR", w.to_bytes(4, "big") + h.to_bytes(4, "big")
                      + bytes([depth, color, 0, 0, interlace]))

    idat = _chunk(b"IDAT", zlib.compress(b"\x00" + b"\x01" * 4))
    end = _chunk(b"IEND", b"")
    assert decode_png_pixels(sig + ihdr(4, 1) + idat + end) is not None
    assert decode_png_pixels(sig + ihdr(4, 1, depth=16) + idat + end) is None
    assert decode_png_pixels(sig + ihdr(4, 1, color=3) + idat + end) is None
    assert decode_png_pixels(sig + ihdr(4, 1, interlace=1) + idat + end) is None
    assert decode_png_pixels(sig + ihdr(0, 1) + idat + end) is None
    # claimed dims over the pixel guard
    assert decode_png_pixels(sig + ihdr(1 << 16, 1 << 16) + idat + end) is None
    # invalid filter type byte (5)
    bad_f = _chunk(b"IDAT", zlib.compress(b"\x05" + b"\x01" * 4))
    assert decode_png_pixels(sig + ihdr(4, 1) + bad_f + end) is None
    # stream shorter / longer than h*(1+stride)
    short = _chunk(b"IDAT", zlib.compress(b"\x00" + b"\x01" * 3))
    assert decode_png_pixels(sig + ihdr(4, 1) + short + end) is None
    long_ = _chunk(b"IDAT", zlib.compress(b"\x00" + b"\x01" * 5))
    assert decode_png_pixels(sig + ihdr(4, 1) + long_ + end) is None
    # DEFLATE stream truncated exactly AFTER yielding the claimed bytes
    # (adler32 / end marker cut — d.eof never set): the bounded-inflate
    # acceptance must still require stream termination (advice r14)
    whole = zlib.compress(b"\x00" + b"\x01" * 4)
    for cut in (1, 4, 5):
        cut_idat = _chunk(b"IDAT", whole[:-cut])
        assert decode_png_pixels(sig + ihdr(4, 1) + cut_idat + end) is None


def test_png_zlib_bomb_is_rejected_bounded():
    """The bomb guard (r14 review fix): a payload with SMALL claimed dims
    whose IDAT inflates ~1000:1 must be rejected WITHOUT materializing
    the expansion — decompression is capped at the claimed size via
    decompressobj(max_length), so rejection is O(claimed), not
    O(inflated)."""
    import time
    import zlib

    from mycenae_spark.functions.multimodal import decode_png_pixels

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = _chunk(b"IHDR", (2).to_bytes(4, "big") + (2).to_bytes(4, "big")
                  + bytes([8, 0, 0, 0, 0]))
    bomb = _chunk(b"IDAT", zlib.compress(b"\x00" * 50_000_000, 9))
    t0 = time.monotonic()
    assert decode_png_pixels(sig + ihdr + bomb + _chunk(b"IEND", b"")) is None
    assert time.monotonic() - t0 < 1.0  # bounded: never inflated 50 MB


def test_png_gray_luma_and_alpha():
    """BT.601 integer luma on a nontrivial RGB triple is exact
    ((299R + 587G + 114B) // 1000) and alpha channels are ignored."""
    import numpy as np

    from mycenae_spark.functions.multimodal import (
        _png_gray,
        decode_png_pixels,
        encode_png,
    )

    px = np.zeros((1, 2, 3), np.uint8)
    px[0, 0] = (255, 0, 0)
    px[0, 1] = (10, 200, 30)
    w, h, ch, raw = decode_png_pixels(encode_png(px, 2))
    g = _png_gray(w, h, ch, raw)
    assert g[0, 0] == (299 * 255) // 1000 == 76
    assert g[0, 1] == (299 * 10 + 587 * 200 + 114 * 30) // 1000 == 123
    # gray+alpha: alpha ignored
    ga = np.dstack([np.array([[7, 9]], np.uint8),
                    np.array([[0, 255]], np.uint8)])
    w, h, ch, raw = decode_png_pixels(encode_png(ga, 4))
    assert _png_gray(w, h, ch, raw).tolist() == [[7, 9]]


def test_dhash64_golden_and_brightness_invariance():
    """Golden dHash values: a strictly-increasing row gradient sets all 64
    bits (signed −1), a decreasing one sets none (0); a brightness shift
    with no wrap never changes the hash (the perceptual property); images
    under the 9×8 grid return None; pinned corpus value guards the spec."""
    import numpy as np

    from mycenae_spark.functions.multimodal import (
        _dhash_from_dec,
        decode_png_pixels,
        dhash64,
        encode_png,
        pixel_corpus_image,
    )

    inc = np.tile(np.arange(9, dtype=np.uint8) * 10, (8, 1))
    assert dhash64(encode_png(inc, 0)) == -1
    dec_img = inc[:, ::-1].copy()
    assert dhash64(encode_png(dec_img, 0)) == 0
    # brightness shift (no wrap): identical hash, different bytes
    assert dhash64(encode_png(inc + 37, 0)) == -1
    # checkerboard [50,0,50,0,…]: the rising edge is at ODD x (0 → 50),
    # so bits 0xAA per row → 0xAAAA…AAAA, reinterpreted signed (bit 63 set)
    chk = np.tile(np.array([1, 0] * 4 + [1], np.uint8) * 50, (8, 1))
    assert dhash64(encode_png(chk, 0)) == 0xAAAAAAAAAAAAAAAA - (1 << 64)
    # too small for the 9×8 grid
    assert dhash64(encode_png(inc[:7, :], 0)) is None
    assert dhash64(encode_png(inc[:, :8], 0)) is None
    assert dhash64(b"not a png") is None
    assert _dhash_from_dec(None) is None

    # pinned judged-corpus triple: same hash across the brightness triple
    hs = []
    for d in (411, 412, 413):
        w, h, ct, gray, px = pixel_corpus_image(d)
        b = encode_png(px, ct, row_filters=lambda y: y % 5, n_idat=2)
        hs.append(_dhash_from_dec(decode_png_pixels(b)))
    assert hs[0] == hs[1] == hs[2] == -4765408807961004101


def test_fit_dims_clamps_degenerate_aspect():
    """r14 review fix: extreme aspect ratios clamp the floor-scaled side
    to 1 instead of emitting a zero-dim (empty) buffer; the stub kernel
    carries the identical clamp (one shared spec)."""
    import pandas as pd

    from mycenae_spark.functions.multimodal import fit_dims, make_resize_kernel

    assert fit_dims(1920, 1, 320, 240) == (320, 1)
    assert fit_dims(1, 1920, 320, 240) == (1, 240)
    assert fit_dims(100, 50, 320, 240) == (100, 50)  # already inside
    assert fit_dims(640, 480, 320, 240) == (320, 240)

    # stub kernel parity: len 1080 → stub dims (1081, 1) → (320, 1)
    kernel = make_resize_kernel(320, 240)
    out = kernel(pd.DataFrame(
        {"media_id": [1], "kind": ["image"], "payload": [b"x" * 1080]}))
    assert (out["in_w"][0], out["in_h"][0]) == (1081, 1)
    assert (out["out_w"][0], out["out_h"][0]) == (320, 1)


def test_pixel_corpus_spec_and_kernels_through_arrow(spark):
    """The judged pixel pipeline end-to-end on a small id frame: render
    REAL PNGs → resize_pixel_stats matches the spec's closed-form px_sum;
    dhash_media decodes ONCE per payload and pairs brightness triples."""
    import numpy as np
    import pyspark.sql.functions as F

    from mycenae_spark.functions.multimodal import (
        _nearest_grid,
        dhash_media,
        fit_dims,
        pixel_corpus_image,
        render_pixel_corpus,
        resize_pixel_stats,
    )

    ids = spark.range(0, 24).select(F.col("id").alias("media_id"))
    media = render_pixel_corpus(ids, "media_id")
    stats = {r["media_id"]: r for r in
             resize_pixel_stats(media, 16, 16, shuffle_buckets=2,
                                max_batch_bytes=1 << 16).collect()}
    sigs = {r["media_id"]: r for r in dhash_media(media).collect()}
    assert len(stats) == len(sigs) == 24
    for d in range(24):
        w, h, ct, gray, px = pixel_corpus_image(d)
        ow, oh = fit_dims(w, h, 16, 16)
        res = gray[np.ix_(_nearest_grid(h, oh), _nearest_grid(w, ow))]
        r = stats[d]
        assert (r["in_w"], r["in_h"], r["out_w"], r["out_h"]) == (w, h, ow, oh)
        assert r["px_sum"] == int(res.astype(np.int64).sum())
        assert (sigs[d]["width"], sigs[d]["height"]) == (w, h)
    # brightness triples share the perceptual hash
    for base in (0, 3, 6, 9, 12, 15, 18, 21):
        assert (sigs[base]["dhash"] == sigs[base + 1]["dhash"]
                == sigs[base + 2]["dhash"] is not None)


def test_ahash64_golden_and_brightness_invariance():
    """aHash (r14, the second perceptual family): golden values — an
    image with one above-mean stripe sets exactly that stripe's bits; a
    brightness shift with no wrap moves samples and mean together, so
    the hash never changes; a uniform image (nothing strictly above the
    mean) hashes to 0; dHash and aHash DISAGREE on a monotone gradient
    (all-ones vs half-split) — the structural difference the bench
    extra measures."""
    import numpy as np

    from mycenae_spark.functions.multimodal import (
        _ahash_from_dec,
        ahash64,
        decode_png_pixels,
        dhash64,
        encode_png,
    )

    # top row bright (200), rest dark (10): mean < 200 → bits 0..7 only
    img = np.full((8, 8), 10, np.uint8)
    img[0, :] = 200
    assert ahash64(encode_png(img, 0)) == 0xFF
    # brightness shift, no wrap: identical hash
    assert ahash64(encode_png(img + 55, 0)) == 0xFF
    # uniform image: no sample strictly above the mean
    assert ahash64(encode_png(np.full((8, 8), 77, np.uint8), 0)) == 0
    # monotone row gradient: dHash saturates (-1), aHash splits the grid
    inc = np.tile(np.arange(9, dtype=np.uint8) * 10, (8, 1))
    assert dhash64(encode_png(inc, 0)) == -1
    a = ahash64(encode_png(inc, 0))
    assert a not in (-1, 0) and bin(a & (1 << 64) - 1).count("1") == 32
    # too small for the 8×8 grid / not a PNG
    assert ahash64(encode_png(img[:7, :], 0)) is None
    assert ahash64(b"nope") is None
    assert _ahash_from_dec(None) is None
    # brightness triples of the judged corpus share the aHash too
    from mycenae_spark.functions.multimodal import pixel_corpus_image

    hs = []
    for d in (411, 412, 413):
        w, h, ct, gray, px = pixel_corpus_image(d)
        b = encode_png(px, ct, row_filters=lambda y: y % 5, n_idat=2)
        hs.append(_ahash_from_dec(decode_png_pixels(b)))
    assert hs[0] == hs[1] == hs[2] is not None


def test_gif_roundtrip_and_rejections():
    """REAL GIF decode (r14): LZW roundtrip across palette sizes and
    dims (the no-dictionary encoder emits frequent CLEAR resets, so the
    decoder's table rebuild and width growth both exercise); interlaced,
    truncated, trailer-first, missing-palette, and out-of-range-index
    streams all return None."""
    import numpy as np

    from mycenae_spark.functions.multimodal import (
        _GRAY_PALETTE,
        decode_gif_pixels,
        decode_image_pixels,
        encode_gif,
    )

    rng = np.random.RandomState(14)
    for h, w in ((5, 7), (23, 31), (10, 48)):
        idx = rng.randint(0, 256, (h, w)).astype(np.uint8)
        g = encode_gif(idx, _GRAY_PALETTE)
        dec = decode_gif_pixels(g)
        assert dec is not None and dec[:3] == (w, h, 3)
        rgb = np.frombuffer(dec[3], np.uint8).reshape(h, w, 3)
        assert (rgb == idx[:, :, None]).all()
    # 4-entry palette at min_code_size 2 — non-identity mapping
    pal4 = bytes(v for i in (0, 85, 170, 255) for v in (i, i, i))
    idx = rng.randint(0, 4, (9, 13)).astype(np.uint8)
    rgb = np.frombuffer(
        decode_gif_pixels(encode_gif(idx, pal4, min_code_size=2))[3],
        np.uint8,
    ).reshape(9, 13, 3)
    assert (rgb[:, :, 0] == np.array([0, 85, 170, 255], np.uint8)[idx]).all()

    good = encode_gif(idx, pal4, min_code_size=2)
    assert decode_gif_pixels(None) is None
    assert decode_gif_pixels(b"GIF89a") is None
    assert decode_gif_pixels(good[:25]) is None  # truncated in data
    # interlace flag set in the image descriptor → rejected
    i = good.index(b"\x2c")
    interlaced = good[: i + 9] + bytes([good[i + 9] | 0x40]) + good[i + 10:]
    assert decode_gif_pixels(interlaced) is None
    # trailer before any image block
    assert decode_gif_pixels(good[:13] + pal4 + b"\x3b") is None
    # LZW minimum code size 9-11 passes the old guard but can neither
    # seed a byte table nor reference a <=256-entry palette — must be
    # None, never a ValueError that kills the Arrow task (review finding)
    i = good.index(b"\x2c")
    lzw_at = i + 10  # descriptor is 10 bytes; pal4 is global, no LCT
    bad_min = good[:lzw_at] + bytes([9]) + good[lzw_at + 1:]
    assert decode_gif_pixels(bad_min) is None
    # dispatch: PNG magic → PNG decoder, GIF magic → GIF decoder
    assert decode_image_pixels(good) is not None
    assert decode_image_pixels(b"\xff\xd8jpeg-ish") is None


def test_cross_container_perceptual_match():
    """The perceptual-hash punchline: the SAME image encoded as PNG and
    as GIF has wildly different bytes (md5 differs) but IDENTICAL dHash
    and aHash — and identical resize pixel sums — because both decoders
    recover the same luma plane exactly."""
    import hashlib

    from mycenae_spark.functions.multimodal import (
        _GRAY_PALETTE,
        _ahash_from_dec,
        _dhash_from_dec,
        _png_gray,
        decode_image_pixels,
        encode_gif,
        encode_png,
        pixel_corpus_image,
    )

    for d in (0, 7, 411):
        w, h, ct, gray, px = pixel_corpus_image(d)
        p = encode_png(px, ct, row_filters=lambda y: y % 5, n_idat=2)
        g = encode_gif(gray, _GRAY_PALETTE)
        assert hashlib.md5(p).hexdigest() != hashlib.md5(g).hexdigest()
        dp, dg = decode_image_pixels(p), decode_image_pixels(g)
        assert _png_gray(*dp).tobytes() == _png_gray(*dg).tobytes()
        assert _dhash_from_dec(dp) == _dhash_from_dec(dg) is not None
        assert _ahash_from_dec(dp) == _ahash_from_dec(dg) is not None


def test_wav_roundtrip_and_rejections():
    """REAL WAV decode (r14, third modality): 16-bit signed and 8-bit
    recentered PCM roundtrip exactly; extension chunks are walked with
    word alignment; float/ADPCM formats, truncation, missing fmt/data,
    and odd-length sample data all return None."""
    import numpy as np

    from mycenae_spark.functions.multimodal import (
        audio_corpus_samples,
        decode_wav_samples,
        encode_wav,
    )

    s = audio_corpus_samples(411)
    w = encode_wav(s)
    n_ch, rate, bits, out = decode_wav_samples(w)
    assert (n_ch, rate, bits) == (1, 8000, 16) and (out == s).all()
    s8 = np.arange(-128, 128)
    assert (decode_wav_samples(encode_wav(s8, bits=8))[3] == s8).all()
    # an extra odd-length chunk between fmt and data must be walked with
    # its pad byte
    fmt_i = w.index(b"fmt ")
    data_i = w.index(b"data")
    extra = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    w2 = w[:data_i] + extra + w[data_i:]
    w2 = w2[:4] + (len(w2) - 8).to_bytes(4, "little") + w2[8:]
    assert (decode_wav_samples(w2)[3] == s).all()

    assert decode_wav_samples(None) is None
    assert decode_wav_samples(b"RIFFxxxxWAVE") is None
    assert decode_wav_samples(w[:30]) is None  # truncated chunk
    # float format (3) rejected: flip the audio-format field
    wf = bytearray(w)
    wf[fmt_i + 8] = 3
    assert decode_wav_samples(bytes(wf)) is None
    # 24-bit rejected (bits field at fmt+22)
    wb = bytearray(w)
    wb[fmt_i + 22] = 24
    assert decode_wav_samples(bytes(wb)) is None


def test_audio_pcm_stats_through_arrow(spark):
    """The judged audio pipeline end-to-end on a small id frame: render
    REAL WAVs → decode → exact integer reductions matching the spec;
    a non-WAV payload yields a null row."""
    import numpy as np
    import pyspark.sql.functions as F

    from mycenae_spark.functions.multimodal import (
        audio_corpus_samples,
        audio_pcm_stats,
        render_audio_corpus,
    )

    ids = spark.range(0, 12).select(F.col("id").alias("media_id"))
    media = render_audio_corpus(ids, "media_id")
    rows = {r["media_id"]: r for r in
            audio_pcm_stats(media, max_batch_bytes=1 << 16).collect()}
    assert len(rows) == 12
    for d in range(12):
        s = audio_corpus_samples(d).astype(np.int64)
        r = rows[d]
        assert r["n_samples"] == s.size and r["sample_rate"] == 8000
        assert r["sum_abs"] == int(np.abs(s).sum())
        assert r["max_abs"] == int(np.abs(s).max())
        assert r["energy"] == int((s * s).sum())
    bad = spark.createDataFrame(
        [(99, b"mp3-ish junk")], "media_id long, payload binary")
    out = audio_pcm_stats(bad).collect()[0]
    assert out["n_samples"] is None and out["energy"] is None


def test_audio_fingerprint_volume_invariance_and_arrow(spark):
    """Audio fingerprint (r14): volume triples share the fingerprint
    (scale invariance: c²-scaled window energies preserve every adjacent
    comparison) while md5/amplitude stats differ; too-short audio and
    non-WAV payloads yield null; the Arrow kernel matches the
    payload-level helper row for row."""
    import numpy as np
    import pyspark.sql.functions as F

    from mycenae_spark.functions.multimodal import (
        _afp_from_samples,
        afp64,
        afp_corpus_samples,
        afp_media,
        encode_wav,
        render_afp_corpus,
    )

    for base in (0, 3, 300):
        fps, sums = [], []
        for d in (base, base + 1, base + 2):
            s = afp_corpus_samples(d)
            fps.append(afp64(encode_wav(s)))
            sums.append(int(np.abs(s).sum()))
        assert fps[0] == fps[1] == fps[2] is not None
        assert len(set(sums)) == 3  # volumes differ; fingerprint doesn't
    # pinned golden from the corpus spec
    assert afp64(encode_wav(afp_corpus_samples(0))) == -4602696377132909056
    assert _afp_from_samples(np.arange(64)) is None  # under the 65 grid
    assert afp64(b"not audio") is None

    ids = spark.range(0, 9).select(F.col("id").alias("media_id"))
    rows = {r["media_id"]: r for r in
            afp_media(render_afp_corpus(ids, "media_id")).collect()}
    for d in range(9):
        assert rows[d]["afp"] == afp64(encode_wav(afp_corpus_samples(d)))
        assert rows[d]["n_samples"] == afp_corpus_samples(d).size


def test_audio_frame_features_explode_shape(spark):
    """Frame explode (r14): per-frame energy/zcr/peak match the numpy
    mirror including the short tail frame; crossings never count across
    a frame boundary; non-WAV payloads yield one null row."""
    import numpy as np
    import pyspark.sql.functions as F

    from mycenae_spark.functions.multimodal import (
        audio_corpus_samples,
        audio_frame_features,
        encode_wav,
        render_audio_corpus,
    )

    ids = spark.range(0, 6).select(F.col("id").alias("media_id"))
    media = render_audio_corpus(ids, "media_id")
    rows = audio_frame_features(media, frame=50).collect()
    by_key = {(r["media_id"], r["frame_idx"]): r for r in rows}
    for d in range(6):
        s = audio_corpus_samples(d).astype(np.int64)
        n_frames = -(-s.size // 50)
        assert sum(1 for k in by_key if k[0] == d) == n_frames
        for fi in range(n_frames):
            win = s[fi * 50 : fi * 50 + 50]
            r = by_key[(d, fi)]
            assert r["n"] == win.size
            assert r["energy"] == int((win * win).sum())
            assert r["zcr"] == int(((win[:-1] * win[1:]) < 0).sum())
            assert r["peak"] == int(np.abs(win).max())
    # an adversarial boundary: [-1, +1] straddling two frames must count 0
    sb = np.zeros(100, dtype=np.int64)
    sb[49], sb[50] = -5, 5
    df = spark.createDataFrame(
        [(7, bytearray(encode_wav(sb)))], "media_id long, payload binary")
    out = {r["frame_idx"]: r for r in
           audio_frame_features(df, frame=50).collect()}
    assert out[0]["zcr"] == 0 and out[1]["zcr"] == 0
    bad = spark.createDataFrame(
        [(9, b"junk")], "media_id long, payload binary")
    nr = audio_frame_features(bad).collect()[0]
    assert nr["frame_idx"] is None and nr["energy"] is None


def test_hamming_pairs_from_sigs_recall_and_null_drop(spark):
    """The shared banding stage (r14 refactor): on the image-corpus
    dHash frame it returns EXACTLY the brute-force Hamming-≤5 pair set
    (pigeonhole recall 1.0 — 6 segments guarantee distance ≤ 5), and
    null signatures (undecodable assets) are dropped before banding
    instead of forming a null bucket."""
    import itertools

    import pyspark.sql.functions as F

    from mycenae_spark.functions.dedup import hamming_pairs_from_sigs
    from mycenae_spark.functions.multimodal import (
        dhash_media,
        render_pixel_corpus,
    )

    ids = spark.range(0, 60).select(F.col("id").alias("media_id"))
    sigs = dhash_media(render_pixel_corpus(ids, "media_id")).select(
        "media_id", "dhash"
    )
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in hamming_pairs_from_sigs(
            sigs, "media_id", "dhash",
            bits=64, n_segments=6, max_hamming=5,
        ).collect()
    }
    sig_map = {r["media_id"]: r["dhash"] for r in sigs.collect()}
    brute = set()
    for a, b in itertools.combinations(sorted(sig_map), 2):
        hd = bin((sig_map[a] ^ sig_map[b]) & ((1 << 64) - 1)).count("1")
        if hd <= 5:
            brute.add((a, b, hd))
    assert got == brute and len(brute) >= 59  # triples guarantee >= 59

    # null signatures never pair (and never crash the banding)
    with_null = sigs.union(
        spark.createDataFrame([(999, None)], "media_id long, dhash long")
    )
    got2 = {
        (r["doc_a"], r["doc_b"])
        for r in hamming_pairs_from_sigs(
            with_null, "media_id", "dhash",
            bits=64, n_segments=6, max_hamming=5,
        ).collect()
    }
    assert got2 == {(a, b) for a, b, _ in brute}
    assert not any(999 in p for p in got2)


def test_media_clusters_and_keep_best_triple_collapse(spark):
    """The judged composition end-to-end (r14 VERDICT item 1 'done'
    criterion): every brightness triple collapses into ONE duplicate
    component, and the keep-best verdict keeps exactly one asset per
    component — the max-px_sum member (for an unmerged triple that is
    the brightest rendition, doc_id % 3 == 2).  Also pins the
    single-decode profile kernel against the two split kernels it
    replaces."""
    import pyspark.sql.functions as F

    from mycenae_spark.functions.multimodal import (
        dhash_media,
        media_dedup_profile,
        render_pixel_corpus,
        resize_pixel_stats,
    )
    from mycenae_spark.registry.llm_queries import (
        dedup_audio_clusters,
        dedup_media_clusters,
        dedup_media_keep_best,
    )
    from tests.conftest import SF_DIR

    # profile == the split kernels, from one decode
    ids = spark.range(0, 12).select(F.col("id").alias("media_id"))
    media = render_pixel_corpus(ids, "media_id")
    prof = {r["media_id"]: r for r in
            media_dedup_profile(media, 16, 16,
                                max_batch_bytes=1 << 16).collect()}
    sigs = {r["media_id"]: r["dhash"] for r in dhash_media(media).collect()}
    sums = {r["media_id"]: r["px_sum"]
            for r in resize_pixel_stats(media, 16, 16).collect()}
    assert len(prof) == 12
    for d in range(12):
        assert prof[d]["dhash"] == sigs[d] is not None
        assert prof[d]["px_sum"] == sums[d] is not None

    labels = {r["media_id"]: r["cluster_id"]
              for r in dedup_media_clusters(spark, SF_DIR).collect()}
    n_docs = max(labels) + 1
    # every asset is paired (its triple guarantees Hamming-0 partners)
    # and every brightness triple shares one component
    assert len(labels) == n_docs
    for base in range(0, n_docs - 2, 3):
        assert labels[base] == labels[base + 1] == labels[base + 2]

    kept = {r["cluster_id"]: r
            for r in dedup_media_keep_best(spark, SF_DIR).collect()}
    # one verdict per component, group sizes partition the corpus
    assert set(kept) == set(labels.values())
    assert sum(r["n_members"] for r in kept.values()) == len(labels)
    members = {}
    for m, c in labels.items():
        members.setdefault(c, []).append(m)
    for c, ms in members.items():
        r = kept[c]
        assert r["n_members"] == len(ms)
        assert r["kept_media"] in ms
    # an unmerged triple keeps the brightest rendition (doc_id % 3 == 2)
    plain = [c for c, ms in members.items() if len(ms) == 3]
    assert plain, "corpus must contain at least one unmerged triple"
    for c in plain:
        assert kept[c]["kept_media"] % 3 == 2

    # audio twin: volume triples collapse the same way, and keep-best
    # keeps the loudest (3x, doc_id % 3 == 2) rendition of a pure triple
    from mycenae_spark.registry.llm_queries import dedup_audio_keep_best

    alabels = {r["media_id"]: r["cluster_id"]
               for r in dedup_audio_clusters(spark, SF_DIR).collect()}
    for base in range(0, n_docs - 2, 3):
        assert alabels[base] == alabels[base + 1] == alabels[base + 2]
    akept = {r["cluster_id"]: r
             for r in dedup_audio_keep_best(spark, SF_DIR).collect()}
    amembers = {}
    for m, c in alabels.items():
        amembers.setdefault(c, []).append(m)
    assert set(akept) == set(alabels.values())
    assert sum(r["n_members"] for r in akept.values()) == len(alabels)
    apure = [c for c, ms in amembers.items() if len(ms) == 3]
    assert apure
    for c in apure:
        assert akept[c]["kept_media"] % 3 == 2  # loudest rendition


def test_hamming_probe_matches_brute_force(spark):
    """Two-sided banding (r15, the incremental media probe): probe-vs-
    index matches equal brute-force cross-side Hamming-≤5 pairs exactly;
    within-side pairs never leak; null signatures drop; the index-side
    valve removes hot segments without crashing the probe."""
    import itertools

    import pyspark.sql.functions as F

    from mycenae_spark.functions.dedup import (
        hamming_pairs_from_sigs,
        hamming_probe_sigs,
    )
    from mycenae_spark.functions.multimodal import (
        dhash_media,
        render_pixel_corpus,
    )

    ids = spark.range(0, 60).select(F.col("id").alias("media_id"))
    sigs = dhash_media(render_pixel_corpus(ids, "media_id")).select(
        "media_id", "dhash"
    )
    pred = F.expr("((media_id - media_id % 3) div 3) % 5 = 4")
    idx, probe = sigs.filter(~pred), sigs.filter(pred)
    got = {
        (r["probe_id"], r["idx_id"], r["hamming"])
        for r in hamming_probe_sigs(
            idx, probe, "media_id", "dhash",
            bits=64, n_segments=6, max_hamming=5,
        ).collect()
    }
    imap = {r["media_id"]: r["dhash"] for r in idx.collect()}
    pmap = {r["media_id"]: r["dhash"] for r in probe.collect()}
    brute = set()
    for p, i in itertools.product(pmap, imap):
        hd = bin((pmap[p] ^ imap[i]) & ((1 << 64) - 1)).count("1")
        if hd <= 5:
            brute.add((p, i, hd))
    assert got == brute
    # the triple-granular split keeps Hamming-0 partners same-side:
    # every cross match is a genuine near-collision, never an exact twin
    assert all(h > 0 for _p, _i, h in got)
    # null probe signature drops instead of crashing
    with_null = probe.union(
        spark.createDataFrame([(999, None)], "media_id long, dhash long")
    )
    got2 = {
        (r["probe_id"], r["idx_id"])
        for r in hamming_probe_sigs(
            idx, with_null, "media_id", "dhash",
            bits=64, n_segments=6, max_hamming=5,
        ).collect()
    }
    assert got2 == {(p, i) for p, i, _h in brute}
    # pigeonhole precondition enforced on both sides
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pigeonhole"):
        hamming_probe_sigs(idx, probe, "media_id", "dhash",
                           bits=64, n_segments=6, max_hamming=6)
