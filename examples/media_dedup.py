"""Perceptual media dedup: the image/audio pipeline in one script.

    python examples/media_dedup.py [sf_dir]

Composes the engine's media operators into the standard asset-dedup flow
— every stage a DataFrame program over the committed rendered corpus:

    committed corpus (CAS artifact)  →  single-decode dedup profile
        →  Hamming-banded near-dup pairs (shared 64-bit banding kernel)
        →  duplicate groups (pointer-jump connected components)
        →  keep-best verdicts (max quality key per group)
        →  incremental probe: a delta batch vs the committed
           signature index (partition-pruned — the daily-crawl shape)
        →  assimilation: the delta's keeps append-merge into the index
           (only touched partitions rewritten, the rest hard-linked),
           so tomorrow's probe sees them — never a corpus re-index

Order matters the way it does in production: the corpus is rendered and
decoded ONCE (the profile frame is 24 bytes/asset — that is what gets
persisted and re-joined; payload bytes never shuffle), exact perceptual
twins collapse at the signature level before any pair expansion, and the
incremental probe never re-touches the corpus — its cost follows the
delta batch.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mycenae_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("media-dedup-example")
    spark.sparkContext.setLogLevel("ERROR")

    import pyspark.sql.functions as F

    from mycenae_spark.functions.dedup import (
        assimilate_sig_index,
        connected_components,
        ensure_sig_index,
        hamming_pairs_from_sigs,
        probe_sig_index,
    )
    from mycenae_spark.functions.multimodal import (
        MEDIA_CORPUS_VERSION,
        media_corpus,
        media_dedup_profile,
    )
    from pyspark.sql import Window

    t0 = time.monotonic()

    # 1. The committed rendered corpus: built once behind the CAS+marker
    #    protocol, then every run is a parquet scan.
    corpus = media_corpus(spark, sf_dir, "png")
    n_assets = corpus.count()
    print(f"[1] corpus: {n_assets} image assets (committed artifact)")

    # 2. ONE decode per payload: 64-bit dHash signature + the keep-best
    #    quality key (16x16 aspect-fit luma pixel sum) in a single pass.
    prof = media_dedup_profile(
        corpus, 16, 16, max_batch_bytes=1 << 20
    ).localCheckpoint(eager=True)
    print(f"[2] profile: {prof.count()} rows (media_id, dhash, px_sum)")

    # 3. Near-dup pairs: Manku 6-segment banding, hot-bucket valve,
    #    exact Hamming verify — never all-pairs.
    pairs = hamming_pairs_from_sigs(
        prof.select("media_id", "dhash"), "media_id", "dhash",
        bits=64, n_segments=6, max_hamming=5, max_bucket_size=512,
    )
    print(f"[3] pairs: {pairs.count()} Hamming<=5 candidate edges")

    # 4. Duplicate groups: min-label pointer-jump components (raises if
    #    the round cap ever binds — never silently wrong).
    labels = connected_components(pairs)
    n_groups = labels.select("cluster_id").distinct().count()
    print(f"[4] groups: {labels.count()} paired assets in {n_groups} groups")

    # 5. Keep-best verdict per group: max quality key, id tie-break.
    j = labels.join(
        prof.select("media_id", "px_sum"),
        labels["doc_id"] == prof["media_id"],
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("px_sum"), "media_id")
    kept = (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("cluster_id", F.col("media_id").alias("kept_media"))
    )
    print(f"[5] verdicts: keep {kept.count()} of {labels.count()} paired "
          "assets (drop the rest)")

    # 6. The daily-crawl shape: commit the corpus slice's signature index
    #    once, probe it with a delta batch — the probe reads only the
    #    index partitions the delta's segments can collide in.  Both
    #    sides reuse step 2's checkpointed profile: the corpus really is
    #    decoded ONCE in this script.
    pred = F.expr("((media_id - media_id % 3) div 3) % 5 = 4")
    sigs = prof.select("media_id", "dhash")
    idx_dir = ensure_sig_index(
        spark, sf_dir,
        sigs.filter(~pred),
        "media_id", "dhash",
        pred_desc="triple_div3_mod5_ne4", kind="dhash-png",
        bits=64, n_segments=6, max_bucket_size=512,
        source_version=MEDIA_CORPUS_VERSION,
    )
    delta_sigs = sigs.filter(pred)
    matches = probe_sig_index(
        spark, idx_dir, delta_sigs, "media_id", "dhash",
        bits=64, n_segments=6, max_hamming=5,
    ).localCheckpoint(eager=True)  # reused: count + keeps anti-join
    n_delta = delta_sigs.count()
    n_dup = matches.select("probe_id").distinct().count()
    print(f"[6] incremental probe: {n_delta} delta assets vs the committed "
          f"index -> {n_dup} near-dup verdicts, {n_delta - n_dup} keeps")

    # 7. Close the loop: the delta's KEEPS join the index without a
    #    rebuild (append-merge; untouched partitions hard-link into a new
    #    immutable CAS directory), so tomorrow's probe sees them.
    keeps = delta_sigs.join(
        matches.select(F.col("probe_id").alias("media_id")).distinct(),
        "media_id", "left_anti",
    )
    grown_dir = assimilate_sig_index(
        spark, idx_dir, keeps, "media_id", "dhash"
    )
    reprobe = probe_sig_index(
        spark, grown_dir, delta_sigs, "media_id", "dhash",
        bits=64, n_segments=6, max_hamming=5,
    )
    n_self = reprobe.filter("probe_id = idx_id").count()
    print(f"[7] assimilate: {keeps.count()} keeps merged into "
          f"{os.path.basename(grown_dir)}; re-probing the delta now finds "
          f"{n_self} of them as their own exact index matches")

    print(f"done in {time.monotonic() - t0:.1f}s")


if __name__ == "__main__":
    main()
