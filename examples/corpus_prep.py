"""Corpus preparation: the training-data pipeline in one script.

    python examples/corpus_prep.py [sf_dir]

Composes the engine's LLM-data operators into the standard pre-training
prep flow — every stage a DataFrame program, so the whole pipeline is one
lazy plan until the final actions:

    quality filter  →  repetition filter  →  exact dedup
        →  span-level dedup (repeated-passage excision candidates)
        →  semantic dedup (SemDeDup, keep-best-per-group)
        →  benchmark decontamination
        →  deterministic split  →  mixing weights
        →  BPE train + tokenize  →  sequence packing (BPE token counts)

Run order matters the way it does in production: cheap scan-bound filters
first (quality/repetition are zero-shuffle — they shrink everything
downstream), content dedup before semantic dedup (exact copies would waste
cluster pair budget), span dedup after exact (whole-copy pairs are gone, so
spans flag genuine boilerplate/quotes), decontamination after dedup (fewer
docs to shingle), splits last (they must see the final corpus), and packing
counts tokens with the TRAINED tokenizer — whitespace counts mis-size
sequences by the subword fertility factor.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from mycenae_spark import get_spark  # noqa: E402
from mycenae_spark.functions.sampling import (  # noqa: E402
    contamination_pairs,
    hash_split,
)
from mycenae_spark.functions.similarity import semantic_pairs  # noqa: E402
from mycenae_spark.functions.text import token_count_ws, tokens  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-prep")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n0 = docs.count()

    # 1+2. Quality + repetition rules — per-row expressions, zero shuffle.
    toks = tokens("text")
    n_toks = F.size(toks)
    dup_tok = F.lit(1.0) - F.size(F.array_distinct(toks)) / n_toks.cast("double")
    mean_len = (F.length("text") - n_toks + F.lit(1.0)) / n_toks
    docs = docs.filter(
        n_toks.between(20, 80) & (dup_tok <= 0.6) & (mean_len <= 5.0)
    )
    n_quality = docs.count()

    # 3. Exact dedup: keep the smallest doc_id per identical text.
    keep = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    docs = docs.join(keep.select("doc_id"), "doc_id")
    n_exact = docs.count()

    # 3b. Span-level dedup (r9, Lee et al. 2107.06499): maximal repeated
    # ≥8-token passages across the surviving docs.  A production run
    # excises the spans; here the near-copy class (a span covering most
    # of a short doc) drops the higher doc_id, and the rest are counted
    # as excision candidates.
    from mycenae_spark.functions.dedup import repeated_span_pairs

    spans = repeated_span_pairs(docs, "doc_id", "text", k=8, max_df=20)
    near_copy = (
        spans.filter(F.col("len_toks") >= 24)
        .select(F.col("doc_b").alias("doc_id")).distinct()
    )
    n_span_pairs = spans.count()
    docs = docs.join(near_copy, "doc_id", "left_anti")
    n_span = docs.count()

    # 4. Semantic dedup, keep-BEST per duplicate group (r8 — the CCNet-
    # style argmax upgrade over keep-min-id): connected components over
    # the in-cluster pairs label each duplicate group; within a group the
    # longest document survives (id tie-break), the rest drop.
    from pyspark.sql import Window

    from mycenae_spark.functions.dedup import connected_components

    cents = emb.filter(F.col("vec_id") % 100 == 0)
    pairs = semantic_pairs(emb, cents, threshold=0.45)
    labels = connected_components(pairs, a_col="vec_a", b_col="vec_b").select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )
    sized = labels.join(
        docs.select(F.col("doc_id").alias("vec_id"), "n_chars"), "vec_id"
    )
    rk = F.row_number().over(
        Window.partitionBy("cluster_id").orderBy(F.desc("n_chars"), "vec_id")
    )
    drop = (
        sized.withColumn("_rk", rk)
        .filter(F.col("_rk") > 1)
        .select(F.col("vec_id").alias("doc_id"))
    )
    docs = docs.join(drop, "doc_id", "left_anti")
    n_sem = docs.count()

    # 5. Decontamination: flag training docs leaking an "eval benchmark"
    # (stand-in: doc_id < 5) — drop leakers above 10% shared 3-grams.
    ev = docs.filter(F.col("doc_id") < 5)
    tr = docs.filter(F.col("doc_id") >= 5)
    leaks = contamination_pairs(tr, ev, "doc_id", "text", n=3)
    leaky = leaks.filter(F.col("n_shared") >= 3).select(
        F.col("train_doc").alias("doc_id")
    ).distinct()
    docs = tr.join(leaky, "doc_id", "left_anti")
    n_clean = docs.count()

    # 6. Deterministic split (never rand() — stable under corpus growth).
    split = hash_split(docs, "doc_id", salt="prep1", train=0.9, val=0.05)

    # 7. Temperature-scaled mixing weights over the TRAIN split.
    g = (
        split.filter(F.col("split") == "train")
        .groupBy("lang")
        .agg(F.sum(token_count_ws("text")).alias("n_tokens"))
    )
    w = Window.partitionBy()
    p = F.col("n_tokens") / F.sum("n_tokens").over(w)
    pa = F.pow(p, 0.3)
    mix = g.select(
        "lang", "n_tokens",
        F.round(pa / F.sum(pa).over(w), 4).alias("weight"),
    ).collect()

    # 7b. Train the tokenizer on the TRAIN split and tokenize with it
    # (r9): packing must count the tokens the model will actually see —
    # whitespace counts mis-size sequences by the subword fertility.
    from mycenae_spark.functions.bpe import bpe_token_counts, learn_merges

    train = split.filter(F.col("split") == "train")
    merges = learn_merges(train, n_merges=20)
    bpe_counts = bpe_token_counts(train, merges)  # (doc_id, n_tokens, ...)
    fertility = bpe_counts.agg(
        (F.sum("n_tokens") / F.sum("n_words")).alias("f")
    ).collect()[0]["f"]

    # 8. Pack the train split into 2048-token sequences (md5-bucketed),
    # sized by the TRAINED tokenizer's counts.
    h = F.md5(F.concat(F.lit("prep1|"), F.col("doc_id").cast("string")))
    wb = (
        Window.partitionBy("bucket").orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = (
        train.join(bpe_counts.select("doc_id", "n_tokens"), "doc_id")
        .select("doc_id", F.col("n_tokens").alias("n_toks"),
                F.substring(h, 1, 1).alias("bucket"), h.alias("h"))
        .withColumn("cum", F.sum("n_toks").over(wb))
        .withColumn("seq_id", F.expr("(cum - n_toks) div 2048"))
        .groupBy("bucket", "seq_id").count()
    )
    n_seqs = packed.count()

    print(f"documents                {n0}")
    print(f"after quality+repetition {n_quality}")
    print(f"after exact dedup        {n_exact}")
    print(f"repeated spans flagged   {n_span_pairs} (near-copies dropped -> {n_span})")
    print(f"after semantic dedup     {n_sem}")
    print(f"after decontamination    {n_clean}")
    for r in sorted(mix, key=lambda r: -r["weight"]):
        print(f"mix weight {r['lang']}: {r['weight']} ({r['n_tokens']} tokens)")
    print(f"BPE merges trained       {len(merges)} (fertility {fertility:.2f} tok/word)")
    print(f"train sequences (2048t)  {n_seqs}")


if __name__ == "__main__":
    main()
