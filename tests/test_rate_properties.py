"""Counter-rate W6 edge cases (SURVEY.md §7.3 'encode W6 exactly and
property-test'): Spark operator vs an independent Python reference model
over hypothesis-generated series, including wraps and resets."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

import pyspark.sql.functions as F

from mycenae_spark.operators.rate import rate


def reference_rates(points, counter, counter_max, reset_value):
    """Row-at-a-time reference (how the Go engine computes it)."""
    out = []
    for (t0, v0), (t1, v1) in zip(points, points[1:]):
        delta = v1 - v0
        if counter:
            if delta < 0:
                delta = delta + counter_max if counter_max is not None else 0.0
            r = delta / ((t1 - t0) / 1e6)
            if reset_value and r > reset_value:
                r = 0.0
        else:
            r = delta / ((t1 - t0) / 1e6)
        out.append((t1, r))
    return out


series_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=10**9),  # ts deltas (µs)
        st.floats(min_value=0, max_value=1000, allow_nan=False, width=32),
    ),
    min_size=2,
    max_size=12,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=series_strategy,
       counter=st.booleans(),
       counter_max=st.sampled_from([None, 100.0, 1000.0]),
       reset_value=st.sampled_from([None, 50.0]))
def test_rate_matches_reference_model(spark, data, counter, counter_max, reset_value):
    ts, points = 0, []
    for dt, v in data:
        ts += dt
        points.append((ts, float(v)))

    df = spark.createDataFrame(
        [("m", t, v) for t, v in points], ["metric", "ts_us", "value"]
    )
    got = {
        r["ts_us"]: r["value"]
        for r in rate(
            df,
            ["metric"],
            counter=counter,
            counter_max=counter_max,
            reset_value=reset_value,
        ).collect()
    }
    expect = dict(
        reference_rates(points, counter, counter_max, reset_value)
    )
    assert set(got) == set(expect)
    for k in expect:
        assert got[k] == pytest.approx(expect[k], rel=1e-9, abs=1e-12), (
            k, got[k], expect[k])


# ---------------------------------------------------------------- ladder

points_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3 * 86_400),  # offset seconds
        st.floats(min_value=0, max_value=1000, allow_nan=False, width=32),
        st.sampled_from(["a", "b"]),                      # series tag
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=points_strategy,
       coarse_ms=st.sampled_from([300_000, 3_600_000, 86_400_000]))
def test_cascade_equals_direct_coarse_rollup(spark, tmp_path_factory, data,
                                             coarse_ms):
    """The ladder's ground-truth invariant: cascading 1m partials to a
    coarser grid is EXACTLY rolling up the raw points at that grid — for
    all four algebraic partials AND the histogram maps — on arbitrary
    point sets (bucket-boundary collisions, multi-day spans, duplicate
    timestamps, multiple series)."""
    import json as _json

    from mycenae_spark.streaming.ingest import decode_json_lines, prepare_points
    from mycenae_spark.streaming.rollup import cascade_rollup, rollup_batch

    BASE = 1704067200000
    rows = [
        (_json.dumps({
            "metric": "prop.m", "tags": {"ksid": "k1", "h": h},
            "timestamp": BASE + off * 1000, "value": v,
        }),)
        for off, v, h in data
    ]
    valid, _ = prepare_points(
        decode_json_lines(spark.createDataFrame(rows, ["value"]))
    )
    valid = valid.localCheckpoint(eager=True)  # one ingest, two consumers

    d = tmp_path_factory.mktemp("cascade_prop")
    fine_dir, rung_dir = str(d / "fine"), str(d / "rung")
    rollup_batch(valid, 60_000).write.mode("overwrite").partitionBy(
        "ksid", "date").parquet(fine_dir)
    cascade_rollup(spark, fine_dir, rung_dir, coarse_ms)

    def canon(df):
        out = {}
        for r in df.collect():
            key = (r["tsid"], r["date"], r["bucket_ms"])
            h = tuple(sorted((r["p_hist"] or {}).items()))
            out[key] = (round(r["p_sum"], 6), r["p_count"],
                        round(r["p_min"], 6), round(r["p_max"], 6), h)
        return out

    direct = canon(rollup_batch(valid, coarse_ms))
    cascaded = canon(spark.read.parquet(rung_dir))
    assert cascaded == direct


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=points_strategy,
       coarse_ms=st.sampled_from([300_000, 3_600_000, 86_400_000]))
def test_kmv_cascade_equals_direct_sketch(spark, tmp_path_factory, data,
                                          coarse_ms):
    """The KMV ladder's ground-truth invariant (the sketch twin of the
    algebraic cascade property): cascading 1m KMV states to a coarser
    grid is EXACTLY sketching the raw points at that grid — the k
    smallest hashes of a coarse bucket are always among the k smallest
    of its fine buckets, so union + re-take-k loses nothing.  Arbitrary
    point sets: duplicate values, bucket splits, multiple series."""
    import json as _json

    from mycenae_spark.streaming.ingest import decode_json_lines, prepare_points
    from mycenae_spark.streaming.rollup import cascade_kmv, kmv_batch

    BASE = 1704067200000
    rows = [
        (_json.dumps({
            "metric": "kprop.m", "tags": {"ksid": "k1", "h": h},
            "timestamp": BASE + off * 1000, "value": v,
        }),)
        for off, v, h in data
    ]
    valid, _ = prepare_points(
        decode_json_lines(spark.createDataFrame(rows, ["value"]))
    )
    valid = valid.localCheckpoint(eager=True)

    d = tmp_path_factory.mktemp("kmv_prop")
    fine_dir, rung_dir = str(d / "fine"), str(d / "rung")
    kmv_batch(valid, 60_000, k=4).write.mode("overwrite").partitionBy(
        "ksid", "date").parquet(fine_dir)
    cascade_kmv(spark, fine_dir, rung_dir, coarse_ms, k=4)

    canon = lambda df: {
        (r["tsid"], r["date"], r["bucket_ms"]): tuple(r["p_kmv"])
        for r in df.collect()
    }
    direct = canon(kmv_batch(valid, coarse_ms, k=4))
    cascaded = canon(spark.read.parquet(rung_dir))
    assert cascaded == direct


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=points_strategy,
       coarse_ms=st.sampled_from([300_000, 3_600_000, 86_400_000]))
def test_qsample_cascade_equals_direct_sample(spark, tmp_path_factory, data,
                                              coarse_ms):
    """The bottom-k VALUE sample's ground-truth invariant (r8 VERDICT
    item 7): cascading 1m sample states to a coarser grid is EXACTLY
    sampling the raw points at that grid — the k smallest point-identity
    hashes of a coarse bucket are always among the k smallest of its
    fine buckets, so union + re-take-k loses nothing.  This is the
    associativity KLL/t-digest merges only approximate; here it is
    bit-exact on arbitrary point sets (duplicates, bucket splits,
    multiple series).  Also pins quantile EXACTNESS under k: for ≤ k
    point buckets the sample IS the bucket, so the p50 read equals the
    exact inverted-CDF median of the raw points."""
    import json as _json
    import math

    from mycenae_spark.streaming.ingest import decode_json_lines, prepare_points
    from mycenae_spark.streaming.rollup import (
        cascade_qsample,
        qsample_batch,
        read_qsample_quantile,
    )

    BASE = 1704067200000
    # one value per (point identity): the sample dedupes on the identity
    # hash (replay semantics), so the raw reference must too — colliding
    # (ts, series) inputs are last-write-wins territory, not sampling's
    data = [
        (off, v, h)
        for (off, h), v in {(o, hh): vv for o, vv, hh in data}.items()
    ]
    rows = [
        (_json.dumps({
            "metric": "qprop.m", "tags": {"ksid": "k1", "h": h},
            "timestamp": BASE + off * 1000, "value": v,
        }),)
        for off, v, h in data
    ]
    valid, _ = prepare_points(
        decode_json_lines(spark.createDataFrame(rows, ["value"]))
    )
    valid = valid.localCheckpoint(eager=True)

    d = tmp_path_factory.mktemp("qs_prop")
    fine_dir, rung_dir = str(d / "fine"), str(d / "rung")
    qsample_batch(valid, 60_000, k=4).write.mode("overwrite").partitionBy(
        "ksid", "date").parquet(fine_dir)
    cascade_qsample(spark, fine_dir, rung_dir, coarse_ms, k=4)

    canon = lambda df: {
        (r["tsid"], r["date"], r["bucket_ms"]):
            tuple((s["hv"], s["v"]) for s in r["p_qs"])
        for r in df.collect()
    }
    direct = canon(qsample_batch(valid, coarse_ms, k=4))
    cascaded = canon(spark.read.parquet(rung_dir))
    assert cascaded == direct

    # exact-under-k: with k >= #points, p50 == the exact inverted-CDF
    # median of the raw points per (series, coarse bucket)
    big_dir = str(d / "big")
    qsample_batch(valid, coarse_ms, k=64).write.mode("overwrite").partitionBy(
        "ksid", "date").parquet(big_dir)
    got = {
        (r["tsid"], r["bucket_ms"]): (r["n_sample"], r["value"])
        for r in read_qsample_quantile(spark, big_dir, 0.5, k=64).collect()
    }
    raw: dict = {}
    for r in valid.collect():
        ts_ms = r["ts"].timestamp() * 1000
        b = int(ts_ms // coarse_ms) * coarse_ms
        raw.setdefault((r["tsid"], b), []).append(r["value"])
    assert set(got) == set(raw)
    for key, vals in raw.items():
        vs = sorted(vals)
        exact = vs[max(1, math.ceil(0.5 * len(vs))) - 1]
        n, est = got[key]
        assert n == len(vals)  # under k: the sample IS the bucket
        assert est == pytest.approx(exact, rel=1e-9), (key, vs, got[key])


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    prefix=st.lists(st.integers(0, 30), min_size=0, max_size=25),
    suffix=st.lists(st.integers(0, 30), min_size=0, max_size=25),
    shared=st.lists(st.integers(0, 30), min_size=7, max_size=15),
)
def test_winnowing_guarantee_property(spark, prefix, suffix, shared):
    """Winnowing's theorem (Schleimer et al.), property-tested: for ANY
    two documents sharing a run of ≥ w + k − 1 = 7 tokens, the selected
    fingerprint sets intersect.  Tokens are drawn from a small alphabet
    so hash ties and repeated grams are COMMON — the regime where a
    sloppy argmin tie-break would break the guarantee."""
    from mycenae_spark.functions.text import winnow_fingerprints

    doc0 = [f"p{t}" for t in prefix] + [f"s{t}" for t in shared]
    doc1 = [f"s{t}" for t in shared] + [f"q{t}" for t in suffix]
    docs = spark.createDataFrame(
        [(0, " ".join(doc0)), (1, " ".join(doc1))],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, "doc_id", "text", k=4, w=4).collect()
    by_doc: dict = {0: set(), 1: set()}
    for r in fps:
        by_doc[r["doc_id"]].add(r["fph"])
    assert by_doc[0] & by_doc[1], (doc0, doc1)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    words=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=8),
        min_size=1, max_size=12,
    )
)
def test_bpe_tokenize_jvm_matches_python_property(spark, words):
    """The BPE replace-semantics contract, property-tested on a binary
    alphabet (adjacent repeats everywhere — the regime the pass-count
    spec exists for): the JVM replace chain's per-doc token counts must
    equal a pure-Python application of the same learned merges."""
    from mycenae_spark.functions.bpe import (
        apply_merge,
        bpe_token_counts,
        learn_merges,
    )

    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    merges = learn_merges(docs, n_merges=5)
    got = {r["doc_id"]: r["n_tokens"]
           for r in bpe_token_counts(docs, merges).collect()}

    def py_tokens(word: str) -> int:
        sym = " " + " ".join(word) + " "
        for _, pair, _c in merges:
            sym = apply_merge(sym, pair)
        return len(sym.split())

    expect = sum(py_tokens(w) for w in words if w)
    assert got == {0: expect}, (words, merges)
