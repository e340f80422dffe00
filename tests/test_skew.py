"""Skew defenses: salted downsample; LSH hot-bucket cap on a degenerate
corpus."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from mycenae_spark.operators.downsample import downsample
from mycenae_spark.operators.skew import salted_downsample
from mycenae_spark.sources.tables import events_as_points

from tests.conftest import SF_DIR


def _degenerate_corpus(spark, n=1000):
    """1k near-identical docs: every band signature collides → one hot
    bucket per band."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("lorem ipsum dolor sit amet consectetur adipiscing elit sed").alias(
            "text"
        ),
    )


def test_lsh_hot_bucket_capped(spark):
    """VERDICT r1: a degenerate signature must not produce a quadratic
    in-bucket pair explosion — over-cap buckets are dropped."""
    from mycenae_spark.functions.dedup import (
        lsh_candidate_pairs,
        lsh_dropped_bucket_stats,
        minhash_signatures,
    )

    sigs = minhash_signatures(_degenerate_corpus(spark), "doc_id", "text")
    capped = lsh_candidate_pairs(sigs, "doc_id", max_bucket_size=64)
    assert capped.count() == 0  # 1000-doc buckets all exceed the cap
    dropped = lsh_dropped_bucket_stats(sigs, "doc_id", 4, 64).collect()
    assert len(dropped) == 4 and all(r["n_ids"] == 1000 for r in dropped)
    # sanity: small genuine buckets still pair up under the same cap
    mixed = _degenerate_corpus(spark, 3).union(
        spark.range(2).select(
            (F.col("id") + 100).alias("doc_id"),
            F.lit("completely different words here repeated tokens apart").alias(
                "text"
            ),
        )
    )
    pairs = lsh_candidate_pairs(
        minhash_signatures(mixed, "doc_id", "text"), "doc_id", max_bucket_size=64
    ).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert got == {(0, 1), (0, 2), (1, 2), (100, 101)}


def test_seeded_components_match_unseeded(spark):
    from mycenae_spark.functions.dedup import (
        bucket_pairs,
        connected_components,
        lsh_buckets,
        lsh_seed_labels,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(i, f"shared prefix words here tail {i % 7} {'x' * (i % 3)}") for i in range(60)],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs, "doc_id", "text")
    buckets = lsh_buckets(sigs, "doc_id").localCheckpoint(eager=True)
    pairs = bucket_pairs(buckets)
    unseeded = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(pairs).collect()
    }
    seeded = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(
            pairs, seeds=lsh_seed_labels(buckets)
        ).collect()
    }
    assert seeded == unseeded and seeded


@pytest.mark.parametrize("agg", ["sum", "count", "min", "max", "avg"])
def test_salted_equals_direct(spark, agg):
    p = events_as_points(spark, SF_DIR)
    direct = {
        (r["metric"], r["bucket_ms"]): r["value"]
        for r in downsample(p, ["metric"], 3_600_000, agg).collect()
    }
    salted = {
        (r["metric"], r["bucket_ms"]): r["value"]
        for r in salted_downsample(p, ["metric"], 3_600_000, agg, n_salts=8).collect()
    }
    assert set(direct) == set(salted)
    for k, v in direct.items():
        assert salted[k] == pytest.approx(v, rel=1e-12)


def test_embedding_lsh_auto_bits_scale(spark):
    """VERDICT r2: n_bits must scale with the corpus — a fixed width means
    every bucket overflows the cap at 100× data and recall collapses.
    auto_lsh_bits keeps expected occupancy constant; embedding_lsh_pairs
    derives it when n_bits is omitted, and still finds real pairs."""
    from mycenae_spark.functions.similarity import (
        auto_lsh_bits,
        embedding_lsh_pairs,
    )

    # expected-occupancy math: one extra bit per corpus doubling, clamped
    assert auto_lsh_bits(10, target_bucket_size=64) == 4
    assert auto_lsh_bits(64 * 2**10, target_bucket_size=64) == 10
    assert auto_lsh_bits(64 * 2**11, target_bucket_size=64) == 11
    assert auto_lsh_bits(2**60, target_bucket_size=64) == 30  # clamp hi
    assert auto_lsh_bits(0) == 4

    # identical vectors → near-dup pairs found with derived bits
    base = [0.5] * 8
    rows = [(i, base) for i in range(6)] + [
        (10 + i, [(-1.0) ** j * (1.0 + i + j) for j in range(8)])
        for i in range(4)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = embedding_lsh_pairs(
        corpus, dim=8, threshold=0.99, n_tables=2, max_bucket_size=64
    ).collect()
    got = {(r["vec_a"], r["vec_b"]) for r in pairs}
    assert {(a, b) for a in range(6) for b in range(a + 1, 6)} <= got


def test_embedding_lsh_degenerate_corpus_capped(spark):
    """An all-identical embedding corpus lands in ONE bucket per table no
    matter the bit width (auto-bits cannot shard identical keys) — the
    hot-bucket cap must drop it rather than go quadratic."""
    from mycenae_spark.functions.similarity import embedding_lsh_pairs

    n = 500
    corpus = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array([F.lit(0.25)] * 8).alias("embedding"),
    )
    pairs = embedding_lsh_pairs(
        corpus, dim=8, threshold=0.5, n_tables=2, max_bucket_size=64
    )
    assert pairs.count() == 0  # dropped, not exploded


def test_embedding_cosine_verdicts_degenerate_corpus(spark):
    """r8 VERDICT item 2: dedup_embedding_cosine's judged form is now the
    bucket-then-verify composition — so it must inherit the hot-bucket
    valve.  An all-identical corpus (one over-cap bucket per table) yields
    ZERO duplicate verdicts instead of a quadratic pair explosion, while a
    small healthy group of near-identical vectors in a mixed corpus gets
    keep-first-id verdicts."""
    from mycenae_spark.functions.similarity import embedding_dedup_verdicts

    n = 400
    blob = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array([F.lit(0.25)] * 8).alias("embedding"),
    )
    v = embedding_dedup_verdicts(
        blob, dim=8, threshold=0.5, n_tables=2, max_bucket_size=64
    ).collect()
    assert len(v) == n and all(r["is_dup"] == 0 for r in v)  # dropped, not exploded

    # mixed corpus: 3 identical vectors (small bucket) + the big blob
    trio = spark.range(3).select(
        (F.col("id") + 10_000).alias("vec_id"),
        F.array(
            *[F.lit(-1.0)] * 4, *[F.lit(0.8)] * 4
        ).alias("embedding"),
    )
    got = {
        r["vec_id"]: (r["is_dup"], r["dup_of"])
        for r in embedding_dedup_verdicts(
            blob.unionByName(trio),
            dim=8,
            threshold=0.5,
            n_tables=2,
            max_bucket_size=64,
        ).collect()
    }
    # keep-first-id: 10000 keeps, 10001/10002 point at 10000
    assert got[10_000] == (0, None)
    assert got[10_001] == (1, 10_000) and got[10_002] == (1, 10_000)
    assert all(got[i] == (0, None) for i in range(n))  # blob still capped


def test_ngram_containment_dfcut_skew(spark):
    """The df-cut is dedup_ngram_containment's skew valve (r8 VERDICT
    item 2): a corpus-wide shared shingle must be dropped BEFORE the
    postings self-join (df-d grams contribute d² rows), so docs related
    only through it produce no pairs — while docs sharing RARE grams keep
    their asymmetric containment verdicts over the df-filtered sets."""
    from mycenae_spark.functions.dedup import ngram_containment_pairs

    # every doc shares the 'common common' bigram; docs 0/1 additionally
    # share rare grams where doc 0's kept set is a subset of doc 1's
    rows = [(0, "common common rare1 rare2 rare3")] + [
        (1, "common common rare1 rare2 rare3 extra4 extra5")
    ] + [(i, f"common common unique{i}a unique{i}b") for i in range(2, 200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in ngram_containment_pairs(
            docs, "doc_id", "text", ngram=2, threshold=0.5, max_df=20
        ).collect()
    }
    # 'common common' (df=200) is cut → no pair rides on it; doc 0's kept
    # grams {common rare1, rare1 rare2, rare2 rare3} are all in doc 1 →
    # C(0,1) = 1.0; doc 1 has extra kept grams → C(1,0) < 1 but ≥ 0.5
    assert pairs[(0, 1)] == 1.0
    assert 0.5 <= pairs[(1, 0)] < 1.0
    assert set(pairs) == {(0, 1), (1, 0)}  # nothing pairs via the hot gram


def test_repeated_span_extraction_and_stop_gram_split(spark):
    """dedup_span_exact's kernel on a constructed corpus: two documents
    share a 28-token passage whose MIDDLE 8 tokens also appear in 28
    other documents (df = 30 > cap 20).  Expected: the hot pure-middle
    gram is df-cut, so the shared passage reports as exactly TWO maximal
    spans flanking it — the honest split semantics the docstring
    documents — with exact 0-based coordinates; and the 28 hot-gram-only
    documents produce NO pairs at all (the d² valve)."""
    from mycenae_spark.functions.dedup import repeated_span_pairs

    a = [f"A{i}" for i in range(1, 11)]
    h = [f"h{i}" for i in range(1, 9)]
    b = [f"B{i}" for i in range(1, 11)]
    shared = a + h + b
    rows = [
        (0, " ".join(["u0", *shared, "v0"])),
        (1, " ".join(["u1", *shared, "v1"])),
    ] + [
        (i, " ".join([f"z{i}x", f"z{i}y", *h, f"w{i}"])) for i in range(2, 30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = sorted(
        tuple(r)
        for r in repeated_span_pairs(docs, "doc_id", "text", k=8, max_df=20)
        .collect()
    )
    # matching diagonal-0 positions are {1..21} minus the cut pure-h gram
    # at pos 11 → islands {1..10} and {12..21}, each spanning 17 tokens
    assert spans == [(0, 1, 1, 1, 17), (0, 1, 12, 12, 17)]


def test_repeated_span_excision_overlap_dedup(spark):
    """Excision accounting on the split-span corpus: doc 1 (the higher
    id) accrues BOTH flanking spans [1..17] and [12..28]; their overlap
    [12..17] must count once — covered = |[1..28]| = 28 of 30 tokens,
    remaining = 2 (the unique prefix/suffix).  Doc 0 keeps its text
    (keep-first: it is doc_a everywhere), so it has no excision row."""
    from mycenae_spark.functions.dedup import repeated_span_excision

    a = [f"A{i}" for i in range(1, 11)]
    h = [f"h{i}" for i in range(1, 9)]
    b = [f"B{i}" for i in range(1, 11)]
    shared = a + h + b
    rows = [
        (0, " ".join(["u0", *shared, "v0"])),
        (1, " ".join(["u1", *shared, "v1"])),
    ] + [
        (i, " ".join([f"z{i}x", f"z{i}y", *h, f"w{i}"])) for i in range(2, 30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_toks"], r["covered_toks"], r["remaining_toks"])
        for r in repeated_span_excision(
            docs, "doc_id", "text", k=8, max_df=20
        ).collect()
    }
    assert got == {1: (30, 28, 2)}


def test_repeated_span_degenerate_corpus_capped(spark):
    """An all-identical corpus (every gram df = N ≫ cap) must yield ZERO
    spans — the df valve drops the postings before the self-join can go
    quadratic, same contract as the LSH hot-bucket cap."""
    from mycenae_spark.functions.dedup import repeated_span_pairs

    n = 300
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("one two three four five six seven eight nine ten").alias("text"),
    )
    assert (
        repeated_span_pairs(docs, "doc_id", "text", k=8, max_df=20).count() == 0
    )


def test_semantic_dedup_hot_cluster_capped(spark):
    """dedup_semantic's valve: a degenerate centroid attracting the whole
    corpus (all-identical embeddings → one cluster) is dropped before pair
    expansion — SemDeDup's in-cluster quadratic must stay bounded.  A
    small healthy cluster in the same corpus still yields its pairs."""
    from mycenae_spark.functions.similarity import semantic_pairs

    n = 300
    degenerate = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array([F.lit(0.25)] * 8).alias("embedding"),
    )
    # 3 extra vectors far from the blob, near each other → their own cluster
    healthy = spark.range(3).select(
        (F.col("id") + 10_000).alias("vec_id"),
        F.array(
            *[F.lit(-1.0)] * 4,
            *[(F.lit(0.9) + F.col("id") * 0.01).cast("double")] * 4,
        ).alias("embedding"),
    )
    corpus = degenerate.unionByName(healthy)
    cents = corpus.filter(F.col("vec_id").isin(0, 10_000))
    pairs = semantic_pairs(
        corpus, cents, threshold=0.5, max_cluster_size=64
    ).collect()
    ids = {r["vec_a"] for r in pairs} | {r["vec_b"] for r in pairs}
    assert ids == {10_000, 10_001, 10_002}  # blob dropped, healthy kept
    assert len(pairs) == 3


def test_knn_graph_hot_cluster_capped(spark):
    """knn_graph's valve (VERDICT r7 item 3): a degenerate centroid
    attracting 90%+ of the corpus must NOT go quadratic — its members drop
    from the graph (no neighbor rows), while a small healthy cluster still
    yields ranked neighbors.  Multi-probe keeps the same bound: the capped
    candidate side means even blob members probing the healthy cluster
    rank at most cap candidates."""
    from mycenae_spark.functions.similarity import knn_graph

    n = 300
    blob = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array([F.lit(0.25)] * 8).alias("embedding"),
    )
    healthy = spark.range(4).select(
        (F.col("id") + 10_000).alias("vec_id"),
        F.array(
            *[F.lit(-1.0)] * 4,
            *[(F.lit(0.9) + F.col("id") * 0.01).cast("double")] * 4,
        ).alias("embedding"),
    )
    corpus = blob.unionByName(healthy)
    cents = corpus.filter(F.col("vec_id").isin(0, 10_000))
    for probes in (1, 2):
        rows = knn_graph(
            corpus, cents, k=3, probes=probes, max_cluster_size=64
        ).collect()
        qids = {r["vec_id"] for r in rows}
        nids = {r["n_id"] for r in rows}
        assert nids <= {10_000, 10_001, 10_002, 10_003}, probes
        if probes == 1:
            # blob members' own cluster is dropped → they get no rows
            assert qids == {10_000, 10_001, 10_002, 10_003}
        # healthy members get their full k=3 in-cluster ranking
        per_q = {q: sum(1 for r in rows if r["vec_id"] == q) for q in qids}
        for q in (10_000, 10_001, 10_002, 10_003):
            assert per_q[q] == 3, (probes, q)


def test_knn_graph_multiprobe_superset_recall(spark):
    """Multi-probe's point, proven on a boundary case: a vector whose true
    nearest neighbor sits just across the centroid boundary finds it with
    probes=2 but not probes=1."""
    from mycenae_spark.functions.similarity import knn_graph

    # two clusters along orthogonal axes; cluster A holds fewer than k
    # members, so the bridge vector's 3rd-nearest neighbor truly lives in
    # cluster B — reachable only by probing its 2nd-nearest centroid
    mk = lambda base, axis, n: spark.range(n).select(
        (F.col("id") + base).alias("vec_id"),
        F.array(
            *[
                (F.lit(1.0) + F.col("id") * 0.01).cast("double")
                if j == axis else F.lit(0.0)
                for j in range(4)
            ]
        ).alias("embedding"),
    )
    a, b = mk(0, 0, 2), mk(100, 1, 5)
    bridge = spark.range(1).select(
        F.lit(50).alias("vec_id"),
        F.array(
            F.lit(1.0), F.lit(0.95), F.lit(0.0), F.lit(0.0)
        ).alias("embedding"),
    )
    corpus = a.unionByName(b).unionByName(bridge)
    cents = corpus.filter(F.col("vec_id").isin(0, 100))
    single = {
        (r["vec_id"], r["n_id"])
        for r in knn_graph(corpus, cents, k=3, probes=1).collect()
    }
    multi = {
        (r["vec_id"], r["n_id"])
        for r in knn_graph(corpus, cents, k=3, probes=2).collect()
    }
    # probes=2 sees strictly more candidates for the bridge vector
    bridge_single = {n for q, n in single if q == 50}
    bridge_multi = {n for q, n in multi if q == 50}
    assert bridge_single == {0, 1}  # confined to its own (small) cluster
    # 3rd neighbor found across the boundary (all B members are cosine-
    # equidistant in exact math, so any of them may win the float tie)
    assert {0, 1} < bridge_multi and len(bridge_multi) == 3
    assert bridge_multi - {0, 1} <= {100, 101, 102, 103, 104}


def test_ivf_assign_supports_non_numeric_ids(spark):
    """The argmax rewrite's negated-id tie-break needs numeric ids; the
    generic-orderable-id behavior the pre-r8 window implementation
    provided must survive (ANSI mode would otherwise throw on the string
    cast).  String-keyed corpus + centroids: assignment works and ties
    break to the LEXICOGRAPHICALLY smallest centroid id, matching the
    numeric path's smallest-id rule."""
    from mycenae_spark.functions.similarity import ivf_assign

    corpus = spark.createDataFrame(
        [("d1", [1.0, 0.0]), ("d2", [0.0, 1.0]), ("mid", [1.0, 1.0])],
        "vec_id string, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [("ca", [1.0, 0.0]), ("cb", [0.0, 1.0])],
        "vec_id string, embedding array<double>",
    )
    got = {r["vec_id"]: r["c_id"] for r in ivf_assign(corpus, cents).collect()}
    # "mid" is equidistant: tie breaks to the smaller id "ca"
    assert got == {"d1": "ca", "d2": "cb", "mid": "ca"}


def test_semantic_pairs_composes_with_trained_centroids(spark):
    """The docstring's claim that kmeans_refine composes in front of
    semantic_pairs, proven: refined centroids produce a valid pair set
    through the same code path (same columns, vec_a < vec_b, scores in
    range), and refining does not disturb a well-separated clustering."""
    from mycenae_spark.functions.similarity import kmeans_refine, semantic_pairs

    # two tight blobs around orthogonal directions + slight jitter
    mk = lambda base, sign: spark.range(20).select(
        (F.col("id") + base).alias("vec_id"),
        F.array(
            *[(F.lit(sign * 1.0) + F.col("id") * 0.001).cast("double")] * 4,
            *[F.lit(0.05)] * 4,
        ).alias("embedding"),
    )
    corpus = mk(0, 1).unionByName(mk(100, -1))
    seeds = corpus.filter(F.col("vec_id").isin(0, 100))
    trained = kmeans_refine(corpus, seeds, iters=1).withColumnRenamed(
        "c_id", "vec_id"
    )
    pairs = semantic_pairs(corpus, trained, threshold=0.9).collect()
    assert pairs  # tight blobs: plenty of high-cosine in-cluster pairs
    for r in pairs:
        assert r["vec_a"] < r["vec_b"] and 0.9 <= r["cos_r"] <= 1.0
        # no cross-blob pair survives: ids stay within one blob's range
        assert (r["vec_a"] < 100) == (r["vec_b"] < 100)


def test_span_contamination_cross_set_only(spark):
    """decontaminate_span's kernel: a train doc quoting 20 eval tokens
    verbatim is flagged with exact coordinates; train↔train repeats are
    NOT reported (that is dedup_span_exact's job), and an eval gram
    repeated across >20 docs is df-cut before it can fan out."""
    from mycenae_spark.functions.dedup import span_contamination

    quote = [f"q{i}" for i in range(20)]
    rows = [
        (0, " ".join(["e0a", *quote, "e0b"])),            # eval doc
        (100, " ".join(["t0a", "t0b", *quote, "t0c"])),   # quoting train doc
        (101, " ".join([f"u{i}" for i in range(12)])),    # clean train doc
    ] + [
        # 30 docs sharing one hot 8-gram with the eval doc -> df-cut
        (200 + i, " ".join([f"z{i}", *[f"h{j}" for j in range(8)]]))
        for i in range(30)
    ] + [(1, " ".join(["e1a", *[f"h{j}" for j in range(8)], "e1b"]))]  # eval
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r)
        for r in span_contamination(
            docs, "doc_id", "text", eval_pred=lambda c: c < 50,
            k=8, max_df=20, flag_len=16,
        ).collect()
    )
    # one span: train 100 positions 2..21 match eval 0 positions 1..20
    assert got == [(100, 0, 2, 1, 20, 1)]


def test_winnow_pairs_boilerplate_cut(spark):
    """dedup_winnow_pairs' valve: a boilerplate passage present in 30
    documents selects the same fingerprints in all of them (df > 20 →
    cut before the self-join can go d²), so boilerplate-only doc pairs
    report nothing — while two docs sharing a RARE passage pair up."""
    from mycenae_spark.functions.dedup import winnow_candidate_pairs

    boiler = [f"b{i}" for i in range(10)]
    rare = [f"r{i}" for i in range(10)]
    rows = [
        (i, " ".join([f"u{i}", *boiler, f"v{i}"])) for i in range(30)
    ] + [
        (100, " ".join(["x0", *rare, "x1"])),
        (101, " ".join(["y0", *rare, "y1"])),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in winnow_candidate_pairs(
            docs, "doc_id", "text", k=4, w=4, max_df=20, min_shared=2
        ).collect()
    }
    assert set(pairs) == {(100, 101)}  # boilerplate cluster reports nothing
    assert pairs[(100, 101)] >= 2


def test_interval_overlap_max_bins_valve(spark):
    """interval_overlap_join's skew valve: a degenerate interval
    spanning the whole timeline (bin fan-out = #bins, colliding with
    everything) is DROPPED at max_bins, while normal-width intervals on
    both sides still pair exactly."""
    from mycenae_spark.operators.ranges import interval_overlap_join

    B = 100
    left = spark.createDataFrame(
        [(1, 50, 140),          # spans bins 0-1
         (2, 300, 310),         # bin 3
         (9, 0, 100_000)],      # degenerate: 1001 bins
        "lid long, a_start long, a_end long",
    )
    right = spark.createDataFrame(
        [(10, 120, 160),        # overlaps lid 1 (bin 1)
         (20, 305, 306),        # inside lid 2
         (30, 50_000, 50_001)], # only the degenerate would match
        "rid long, w_start long, w_end long",
    )
    out = interval_overlap_join(
        left, right, bin_width=B,
        left_start="a_start", left_end="a_end",
        right_start="w_start", right_end="w_end",
        max_bins=16,
    )
    pairs = {(r["lid"], r["rid"]): r["overlap"] for r in out.collect()}
    assert set(pairs) == {(1, 10), (2, 20)}  # giant dropped, bulk exact
    assert pairs[(1, 10)] == 140 - 120
    assert pairs[(2, 20)] == 1
    # without the valve the giant pairs with everything it covers
    out2 = interval_overlap_join(
        left, right, bin_width=B,
        left_start="a_start", left_end="a_end",
        right_start="w_start", right_end="w_end",
    )
    assert {(r["lid"], r["rid"]) for r in out2.collect()} == {
        (1, 10), (2, 20), (9, 10), (9, 20), (9, 30)}


def test_iter_boundary_resets_carried_plan_stats(spark):
    """r15 root-cause regression: Dataset.localCheckpoint pins the
    checkpointed plan's sizeInBytes BigInt onto the new LogicalRDD, and an
    iterative self-join loop then SQUARES it every round — the digit
    count doubles per round and from ~round 15 the driver burns its time
    in BigInteger.multiplyKaratsuba (measured 0.3 s → 260 s/round on a
    99-edge graph).  _iter_boundary rebuilds the frame over the SAME
    checkpointed RDD without originStats, so stats stay leaf-sized no
    matter how many rounds compound."""
    import pyspark.sql.functions as F

    from mycenae_spark.functions.dedup import _iter_boundary

    big = spark.range(64).select(
        F.col("id").alias("node"), F.col("id").alias("label")
    )
    for _ in range(6):  # six self-joins square the size estimate 6 times
        other = big.select(
            F.col("node").alias("n2"), F.col("label").alias("l2")
        )
        big = big.join(other, big["label"] == other["n2"]).select(
            "node", "label"
        )

    def digits(df):
        return len(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )

    plain = big.localCheckpoint(eager=True)
    reset = _iter_boundary(big)
    assert digits(plain) > 60  # the carried product estimate
    assert digits(reset) < 30  # fresh leaf stats
    # the boundary is value-neutral
    assert sorted(map(tuple, reset.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_connected_components_converges_or_raises(spark):
    """r15: a round cap that silently returns non-converged labels is
    WRONG output (the sf0.1 audio-fingerprint graph has a 758-node chain
    component that needed >20 rounds under the old cap).  The kernel now
    raises when the cap binds, and the default cap converges a
    600-diameter path to the exact component minimum."""
    import pytest as _pytest

    from mycenae_spark.functions.dedup import connected_components

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(599)], "doc_a long, doc_b long"
    )
    # driver_max_edges=0 forces the DISTRIBUTED path — this test pins the
    # iterative kernel, which the size gate would otherwise skip
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(path, max_iter=3, driver_max_edges=0)
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(path, driver_max_edges=0).collect()
    }
    assert len(labels) == 600 and set(labels.values()) == {0}
    # and the size-gated driver fast path answers identically
    fast = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(path).collect()
    }
    assert fast == labels


def test_duplicated_substring_spans_exactsubstr_semantics(spark):
    """dedup_exact_substr's kernel on a constructed corpus, pinning the
    three behaviors the df-capped pair pipeline cannot express (the r18
    VERDICT missing-#6 evaluation, resolved as ADD):

    * NO df ceiling — a 16-token passage repeated in 30 documents (df
      far above repeated_span_pairs' max_df=20 valve) reports in EVERY
      copy, because the pairless form never pays the d² join the valve
      exists to bound;
    * ALL occurrences report (the released tool's semantics) — both
      copies of a passage shared by two docs, not just keep-first's
      doc_b side;
    * WITHIN-document repeats count toward df and report;

    plus interval MERGE maximality: overlapping duplicated windows
    coalesce into one maximal span with exact 0-based coordinates."""
    from mycenae_spark.functions.dedup import duplicated_substring_spans

    boiler = [f"h{i}" for i in range(16)]          # 16-token boilerplate
    passage = [f"p{i}" for i in range(24)]          # 24-token shared run
    rows = (
        # 30 docs carrying the boilerplate at pos 1 (df=30 > any cap)
        [(i, " ".join([f"u{i}", *boiler, f"v{i}"])) for i in range(30)]
        # two docs sharing the 24-token passage at pos 2 (both report)
        + [(100, " ".join(["x0", "x1", *passage, "x2"])),
           (101, " ".join(["y0", "y1", *passage, "y2"]))]
        # one doc repeating ITS OWN 16-token run at pos 1 and pos 19
        + [(200, " ".join(["q0", *boilerplate_free(), "q1", "q2",
                           *boilerplate_free(), "q3"]))]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r)
        for r in duplicated_substring_spans(docs, "doc_id", "text", L=16)
        .collect()
    )
    # 30 boilerplate copies, one span each at [1, 17)
    assert [(i, 1, 16) for i in range(30)] == got[:30]
    # the shared 24-token passage: overlapping duplicated 16-windows at
    # pos 2..10 merge to ONE maximal span of 24 tokens, in BOTH docs
    assert (100, 2, 24) in got and (101, 2, 24) in got
    # the within-document repeat reports at both of its positions
    d200 = [g for g in got if g[0] == 200]
    assert d200 == [(200, 1, 16), (200, 19, 16)]
    assert len(got) == 34


def boilerplate_free():
    """16 tokens distinct from the other fixtures (within-doc repeat)."""
    return [f"s{i}" for i in range(16)]
