"""Sampling/splitting properties beyond the oracle hash-match: split
stability under corpus change (the property that justifies hash splits over
rand()), ratio accuracy, and packing invariants."""

from __future__ import annotations

import pyspark.sql.functions as F

from mycenae_spark.functions.sampling import (
    contamination_pairs,
    hash_split,
    hex_threshold,
)
from mycenae_spark.registry.util import t

from tests.conftest import SF_DIR


def test_hex_thresholds():
    assert hex_threshold(0.90) == "e666"
    assert hex_threshold(0.95) == "f333"


def test_hash_split_rejects_degenerate_ratios(spark):
    """train + val = 1 would format the cumulative bound as 5-char "10000",
    which sorts BELOW most 4-char hex buckets — a silent mislabeling, so
    the API refuses it (two-way splits are spelled val=0)."""
    import pytest as _pytest

    d = t(spark, SF_DIR, "documents")
    with _pytest.raises(ValueError, match="train \\+ val < 1"):
        hash_split(d, "doc_id", train=0.9, val=0.1)
    # two-way split: empty val bucket, test takes the remainder
    labels = {
        r["split"]
        for r in hash_split(d, "doc_id", train=0.9, val=0.0)
        .select("split").distinct().collect()
    }
    assert labels == {"train", "test"}


def test_split_is_stable_under_corpus_change(spark):
    """A document's split depends only on its id — filtering the corpus
    (growth, deletion, re-partitioning) never moves survivors between
    splits.  rand()-based assignment fails exactly this."""
    d = t(spark, SF_DIR, "documents")
    full = hash_split(d, "doc_id").select("doc_id", "split")
    sub = hash_split(d.filter(F.col("doc_id") % 7 == 0), "doc_id").select(
        "doc_id", F.col("split").alias("split_sub")
    )
    moved = (
        full.join(sub, "doc_id")
        .filter(F.col("split") != F.col("split_sub"))
        .count()
    )
    assert moved == 0


def test_split_ratios_near_nominal(spark):
    d = t(spark, SF_DIR, "documents")
    n = d.count()
    by = dict(
        (r["split"], r["c"])
        for r in hash_split(d, "doc_id").groupBy("split").agg(
            F.count(F.lit(1)).alias("c")
        ).collect()
    )
    assert set(by) == {"train", "val", "test"}
    # md5 is uniform; at n=500 the binomial 3σ band for p=0.9 is ~±0.04
    assert abs(by["train"] / n - 0.90) < 0.05
    assert abs((by["val"] + by["test"]) / n - 0.10) < 0.05


def test_gram_postings_match_array_formulation(spark):
    """The codegen'd postings form (posexplode + lead window) and the
    per-document array form (higher-order transform) are the same set —
    the perf rewrite changed the plan, not the semantics."""
    from mycenae_spark.functions.sampling import distinct_grams, gram_postings

    d = t(spark, SF_DIR, "documents")
    fast = gram_postings(d, "doc_id", "text", 3)
    slow = distinct_grams(d, "doc_id", "text", 3).select(
        "doc_id", F.explode("grams").alias("gram")
    ).distinct()
    assert fast.exceptAll(slow).count() == 0
    assert slow.exceptAll(fast).count() == 0


def test_contamination_self_overlap_is_total(spark):
    """A document 'contaminates' itself completely: running the detector
    with eval == train (same slice both sides) yields, for every doc with
    at least n tokens, a pair (d, d) whose n_shared equals its distinct
    gram count."""
    d = t(spark, SF_DIR, "documents").filter(F.col("doc_id") < 20)
    pairs = contamination_pairs(d, d, "doc_id", "text", n=3)
    diag = pairs.filter(F.col("train_doc") == F.col("eval_doc"))
    from mycenae_spark.functions.sampling import distinct_grams

    sz = distinct_grams(d, "doc_id", "text", 3).select(
        F.col("doc_id").alias("train_doc"), F.size("grams").alias("sz")
    )
    bad = (
        diag.join(sz, "train_doc")
        .filter(F.col("n_shared") != F.col("sz"))
        .count()
    )
    assert bad == 0
    assert diag.count() == sz.count()


def test_pack_sequences_respects_budget(spark):
    """Every packed sequence except a bucket's last holds ≥ the 2048-token
    budget's worth of starts — equivalently, a sequence's token sum can
    only exceed the budget via its final straddling document, and chunk
    ids per bucket are dense from 0."""
    from mycenae_spark.registry.llm_queries import pack_sequences

    seqs = pack_sequences(spark, SF_DIR).collect()
    by_bucket: dict[str, list] = {}
    for r in seqs:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for bucket, rows in by_bucket.items():
        ids = sorted(r["seq_id"] for r in rows)
        assert ids == list(range(len(ids))), bucket  # dense from 0
        # cumulative reconstruction: all but the last sequence must end at
        # or past its budget boundary (a doc straddles the cut)
        rows.sort(key=lambda r: r["seq_id"])
        cum = 0
        for r in rows[:-1]:
            cum += r["seq_toks"]
            assert cum >= (r["seq_id"] + 1) * 2048, (bucket, r["seq_id"])


def test_stratified_sample_matches_global_ntile(spark):
    """The histogram-decomposed stratified sample (no global window) must
    reproduce the naive global-ntile formulation bit-exactly — including
    strata that straddle runs of equal values and a row count not divisible
    by n_strata."""
    from pyspark.sql import Window

    from mycenae_spark.functions.sampling import stratified_sample

    # 103 rows, heavy value ties (v = i // 7), 10 strata: boundaries land
    # inside tie runs, N % 10 = 3 so the first 3 strata take an extra row
    rows = [(i, i // 7) for i in range(103)]
    df = spark.createDataFrame(rows, ["id", "v"])
    got = {
        tuple(r)
        for r in stratified_sample(df, "id", "v", k=3, n_strata=10).collect()
    }

    w_tile = Window.orderBy("v", "id")
    h = F.md5(F.concat(F.lit("strat1|"), F.col("id").cast("string")))
    naive = (
        df.select("id", "v", F.ntile(10).over(w_tile).alias("stratum"), h.alias("h"))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("stratum").orderBy("h", "id")),
        )
        .filter(F.col("rn") <= 3)
        .select("stratum", "id", "v", "rn")
    )
    assert got == {tuple(r) for r in naive.collect()}


def test_stratified_sample_empty_and_tiny(spark):
    from mycenae_spark.functions.sampling import stratified_sample

    df = spark.createDataFrame([(1, 5), (2, 9)], ["id", "v"])
    out = stratified_sample(df, "id", "v", k=2, n_strata=10)
    assert out.count() == 2  # q == 0 branch: stratum = global rank
    assert stratified_sample(df.limit(0), "id", "v").count() == 0
