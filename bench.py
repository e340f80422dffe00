"""Benchmark harness (driver contract, BASELINE.md).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints the result JSON
(``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}``) twice: first the FULL map + extras (one line, ~12 KB —
what BENCH_LOCAL_r{N}.json archives), then a compact final line sized
to survive the driver's 2000-char stdout-tail archive, carrying every
per-query timing as a name-sorted values array (r17 VERDICT item 4 —
see the comment at the emit site).

Each query is executed to completion with a cheap terminal action
(``count`` after the full computation) so the measured time is the real
plan execution, not a ``collect`` of a large result into the driver.

Noise control (VERDICT r6 item 8): every query runs ``$SPARK_GRAFT_BENCH_REPS``
times (default 3) and the quoted per-query/suite numbers are the BEST run —
host variance inflated r6's unchanged plans 1.35× against r3, which made the
2× regression gate mushy; best-of-N measures the plan, not the host's mood.
The first-run total is still emitted (``extras.total_first_run_s``) so
cold-path drift stays visible.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mycenae_spark.registry import QUERIES  # noqa: E402
from mycenae_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family, covering scan, filter, hash-agg,
# window-heavy TSDB math, joins (broadcast + shuffle), LSH dedup, ANN top-k.
HEADLINE = [
    "scan_project",
    "filter_time_range",
    "agg_grouped",
    "downsample_avg_1m",
    "fill_null",
    "rate",
    "order_rate_after_agg",
    "topk_series_by_sum",
    "stream_session",
    "join_inner",
    "join_broadcast",
    "join_asof",
    "join_range",
    "join_multiway",
    "agg_rollup",
    "agg_cube",
    "fill_nan",
    "text_point_latest",
    "downsample_p95",
    "dedup_embedding_lsh",
    "dedup_near_signature",
    "dedup_minhash_pairs",
    # dedup_clusters: demoted r14 — composition of dedup_minhash_pairs
    # (timed above) + the iterative pointer-jump components kernel, which
    # the headline still times TWICE (dedup_semantic_clusters,
    # dedup_jaccard_prefix_clusters) with different pair generators.
    # Stays judged.
    "dedup_simhash",
    "dedup_ngram_jaccard_dfcut",
    "sim_topk",
    "ann_ivf_topk",
    "ann_ivf_kmeans_topk",
    "ann_ivf_rerank_topk",
    # ann_ivf_kmeans2_topk: demoted r14 — plan-identical to
    # ann_ivf_kmeans_topk plus one more Lloyd iteration; its recall
    # stays measured in extras (ann_ivf_kmeans2_recall_at3).  Stays judged.
    "window_cumsum",
    "agg_percentile",
    "tsdb_pipeline_expression",
    "text_tokens",
    "text_quality",
    # round 3
    "dedup_minhash_pairs_auto",
    "dedup_ngram_containment",
    "rollup_downsample_avg",
    "text_shingle_stats",
    "window_ewma",
    "multimodal_media_stats",
    "multimodal_frame_sample",
    # round 6
    "ann_pq_adc_topk",
    "ann_pq_search_topk",
    "ann_ivfpq_topk",
    "sample_hash_split",
    "sample_stratified",
    "decontaminate_ngram",
    "corpus_mix_profile",
    "pack_sequences",
    # round 7
    "dedup_semantic",
    "sample_mix_temperature",
    "text_quality_filter",
    "text_repetition",
    "text_unigram_logprob",
    "sample_resample_epochs",
    "text_langid_trigram",
    # knn_graph_topk: demoted r14 — single-probe baseline of
    # knn_graph_multiprobe (kept); recall stays in extras.  Stays judged.
    "dedup_semantic_clusters",
    "agg_kmv_distinct",
    # round 8
    "knn_graph_multiprobe",
    # text_langid_mixture: demoted from the headline in r12 — at the
    # judged {3} order set it is semantically and plan-family identical
    # to text_langid_trigram (which stays, as the inline-vs-indexed
    # comparison against text_langid_indexed), so the suite was timing
    # the same computation three ways at ~4 s each.  The id stays
    # judged (oracle replica + driver window) and its accuracy stays
    # measured in extras (langid_mixture_accuracy).
    "text_bpe_pair_stats",
    "source_quality_profile",
    "sample_ccnet_buckets",
    "window_holt",
    "window_zscore",
    "window_holtwinters",
    # round 9
    # dedup_exact_substr (r19): the pairless ExactSubstr form — distinct
    # plan family from the pair pipeline (hash-agg + join-back + per-doc
    # window; no postings self-join), so it times separately.
    "dedup_exact_substr",
    # dedup_span_exact: demoted r14 — strict plan-prefix of
    # dedup_span_excise (postings → islands subtree; excise adds the
    # position-union accounting on top), so the suite was timing the
    # same subtree twice.  Stays judged (oracle + driver window).
    "dedup_span_excise",
    "dedup_embedding_cosine",
    "text_bpe_train",
    "text_bpe_tokenize",
    "decontaminate_span",
    "text_winnow_fingerprint",
    "text_tfidf_topk",
    "text_char_entropy",
    "text_pmi_bigrams",
    # dedup_winnow_pairs: demoted r14 — strict plan-prefix of
    # dedup_winnow_spans (same fingerprint postings + pair join; spans
    # adds span verification).  Stays judged.
    "join_asof_tolerance",
    # round 10
    "join_asof_forward",
    "join_asof_nearest",
    "dedup_winnow_spans",
    "dedup_incremental",
    # sample_dsir: demoted r14 — plan-identical to sample_dsir10k
    # (same dsir_weights pipeline, 1k vs 10k hash buckets; the 10k
    # production grain stays).  Stays judged.
    "events_funnel",
    # dedup_simhash_pairs: demoted r14 — plan-identical 32-bit twin of
    # dedup_simhash_pairs64 (Manku production grain, kept).  Stays judged.
    "events_retention",
    # round 11
    "dedup_simhash_pairs64",
    "dedup_index_probe",
    "sample_dsir10k",
    "ann_filtered_topk",
    "series_gaps",
    "downsample_cal_month",
    "downsample_sum_1w",
    "ann_ivf_filtered_topk",
    "series_correlation",
    "text_bigram_logprob",
    "events_attribution",
    "window_holt_backtest",
    "points_last",
    # series_cap_roundtrip: demoted r14 by the roundtrip policy below —
    # it builds two temp lakes and walks a real HTTP reject/pagination
    # lifecycle (~5 s of fixed machinery, not a query plan).  Stays judged.
    "events_attribution_first",
    "events_attribution_position",
    "text_langid_indexed",
    "multimodal_header_stats",
    "join_interval_overlap",
    "ann_sq8_topk",
    "text_trigram_logprob",
    # dedup_jaccard_prefix: demoted r16 — strict plan-prefix of
    # dedup_jaccard_prefix_clusters below (same PPJoin candidate
    # generation + verify; clusters adds components on top), the exact
    # relationship that demoted dedup_image_phash in r15.  Stays judged.
    "sample_weighted_topk",
    "ann_sq8_rerank_topk",
    "downsample_cal_week",
    "dedup_jaccard_prefix_clusters",
    "decontaminate_split_leakage",
    # round 14: real pixel decode (render PNGs → unfilter → luma →
    # resample) and perceptual-hash pairs over the same corpus
    "multimodal_pixel_stats",
    # dedup_image_phash: demoted r15 — strict plan-prefix of
    # dedup_media_keep_best below (render → decode → signature → banded
    # pairs); the pair stage keeps getting timed inside the superset.
    # Stays judged.
    "multimodal_pixel_stats_mixed",
    "multimodal_audio_stats",
    "dedup_audio_fingerprint",
    "multimodal_audio_frames",
    # round 15: the perceptual families finished to duplicate GROUPS +
    # keep-best verdicts.  keep_best is the new plan shape (single-decode
    # profile → banding → pointer-jump components → quality join + argmax
    # window); dedup_media_clusters is demoted-but-judged (pair stage
    # timed inside keep_best; the component kernel is timed via
    # dedup_semantic_clusters + dedup_jaccard_prefix_clusters);
    # dedup_audio_keep_best is the same plan shape at the audio corpus —
    # judged, not double-timed.
    "dedup_media_keep_best",
    # r16 (r15 VERDICT item 4): dedup_audio_clusters PROMOTED — it is the
    # iterative-components family's honest worst case at sf0.1 (17.5k
    # pairs, a 758-node chain, ~25 convergence rounds; ~9.7 s idle after
    # the _iter_boundary fix — slower than anything else in the suite),
    # and a timed headline that hides its own slowest query is lying.
    # The cheap image instance of the same family stays demoted.
    "dedup_audio_clusters",
    # the two-sided probe shape (delta batch vs corpus signature index)
    # is new — nothing else times an index-probe banding join at the
    # perceptual families.  The inline form and the committed-index form
    # both time (the dedup_incremental / dedup_index_probe precedent):
    # same verdicts by shared oracle, different read paths.
    "dedup_media_incremental",
    "dedup_media_index_probe",
    # dedup_media_index_assimilate / dedup_index_assimilate (r16): judged,
    # not headline-timed — warm runs are ensure(cache hit) +
    # assimilate(cache hit) + probe, i.e. plan-identical to the
    # *_index_probe ids already timed above; the assimilation WRITE cost
    # is priced separately in extras (sig_index_assim_s, cache-flagged)
    # like every other artifact build.
    # Streaming lifecycle roundtrips (stream_funnel/gaps/dedup/evict/
    # heavyhitters_roundtrip, the bus/ingest roundtrips, and r17's
    # stream_tsdb_ingest_roundtrip — ~22 s of streaming batches +
    # ladder refreshes, scale-invariant synthesized input) are judged
    # via the driver window + oracle replica but never headline-timed —
    # they measure micro-batch machinery and, for the eviction one,
    # deliberate wall-clock sleeps (~15 s against a 6 s idleness
    # window), not a query plan.  The headline is the QUERY surface.
    # pipeline_corpus_prep (r17): judged, not headline-timed — it is a
    # COMPOSITION of subtrees the headline already times individually
    # (text_quality_filter, dedup_semantic+clusters, decontaminate_ngram,
    # sample_hash_split/mix_temperature, pack_sequences) plus 4 stage-
    # boundary localCheckpoints and 6 count() actions (11.7 s warm at
    # sf0.1 — a multi-action materialization discipline, not one plan);
    # headlining it would double-time five families, the exact
    # relationship that demoted dedup_clusters in r14.
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("mycenae-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + file listing so per-query numbers measure the plans.
    QUERIES["scan_project"](spark, sf_dir).count()

    # Materialize the PQ index up front and price the build separately:
    # the per-query numbers for both PQ queries are then the amortized
    # search phase (the production shape — the build is a once-per-corpus
    # job; ann_pq_adc_topk reuses a committed index when one exists, r7).
    # The cold build stays priced in ann_pq_index_build_s below.
    from mycenae_spark.functions import pq as _pq
    from mycenae_spark.registry.util import r6 as _r6

    # The index root persists across bench runs (that IS the amortization),
    # so report whether each build actually ran or was a marker cache hit —
    # otherwise round-over-round build numbers silently compare a build
    # against a stat call.
    pq_cached = _pq.index_is_committed(_pq.pq_index_dir(sf_dir, "pq"))
    t0 = time.perf_counter()
    _pq.ensure_pq_index(spark, sf_dir, rounder=_r6)
    pq_build_s = round(time.perf_counter() - t0, 3)

    ivfpq_cached = _pq.index_is_committed(_pq.pq_index_dir(sf_dir, "ivfpq"))
    t0 = time.perf_counter()
    _pq.ensure_ivfpq_index(spark, sf_dir, rounder=_r6)
    ivfpq_build_s = round(time.perf_counter() - t0, 3)

    # Same amortization contract for the minhash band index
    # (dedup_index_probe): build-once is a corpus job, the judged query is
    # the search phase — price the build separately, flag cache hits.
    from mycenae_spark.functions import dedup as _dd
    from mycenae_spark.registry.llm_queries import MAX_BUCKET as _MB
    from mycenae_spark.registry.llm_queries import N_BANDS as _NB
    from mycenae_spark.sources.tables import load_table as _lt
    import pyspark.sql.functions as _F

    band_fp = _dd.band_index_fingerprint(
        sf_dir, "doc_id%10<8", _NB, 3, _MB, _dd.BAND_INDEX_SHARDS
    )
    band_cached = _pq.index_is_committed(
        os.path.join(_pq._index_root(), f"bands-{band_fp}")
    )
    t0 = time.perf_counter()
    _dd.ensure_band_index(
        spark, sf_dir,
        _lt(spark, sf_dir, "documents").filter(_F.col("doc_id") % 10 < 8),
        "doc_id", "text", pred_desc="doc_id%10<8",
        n_bands=_NB, max_bucket_size=_MB,
    )
    band_build_s = round(time.perf_counter() - t0, 3)

    # Langid profile artifact (text_langid_indexed): train-once is a
    # corpus job, the judged query is the search phase — same pricing
    # convention as the PQ/band indexes.
    from mycenae_spark.functions import langid as _li

    langid_cached = _pq.index_is_committed(
        _li.langid_index_dir(sf_dir, (3,))
    )
    t0 = time.perf_counter()
    _li.ensure_langid_profiles(spark, sf_dir, (3,))
    langid_build_s = round(time.perf_counter() - t0, 3)

    # Rendered media corpora (r15, r14 VERDICT item 3): the corpus is a
    # committed artifact now — render-once is priced here per kind with
    # the same cache-hit flag convention; judged media queries then read
    # parquet and decode (one Arrow crossing, no in-query render).
    from mycenae_spark.functions import multimodal as _mm

    media_builds: dict[str, float] = {}
    media_cached: dict[str, bool] = {}
    for kind in ("png", "mixed", "audio", "afp"):
        media_cached[kind] = _pq.index_is_committed(
            _mm.media_corpus_dir(sf_dir, kind)
        )
        t0 = time.perf_counter()
        _mm.ensure_media_corpus(spark, sf_dir, kind)
        media_builds[kind] = round(time.perf_counter() - t0, 3)

    # Perceptual signature index (dedup_media_index_probe): build-once
    # is a corpus job — price it separately with the cache-hit flag.
    _sig_fp = _dd.sig_index_fingerprint(
        sf_dir, "triple_div3_mod5_ne4", "dhash-png", 64, 6, _MB,
        _dd.SIG_INDEX_SHARDS, source_version=_mm.MEDIA_CORPUS_VERSION,
    )
    sigidx_cached = _pq.index_is_committed(
        os.path.join(_pq._index_root(), f"sigidx-{_sig_fp}")
    )
    t0 = time.perf_counter()
    _pred = _F.expr("((media_id - media_id % 3) div 3) % 5 = 4")
    from mycenae_spark.functions.multimodal import (
        dhash_media as _dhm,
        media_corpus as _mc,
    )

    _dd.ensure_sig_index(
        spark, sf_dir,
        _dhm(_mc(spark, sf_dir, "png").filter(~_pred),
             max_batch_bytes=1 << 20).select("media_id", "dhash"),
        "media_id", "dhash",
        pred_desc="triple_div3_mod5_ne4", kind="dhash-png",
        bits=64, n_segments=6, max_bucket_size=_MB,
        source_version=_mm.MEDIA_CORPUS_VERSION,
    )
    sigidx_build_s = round(time.perf_counter() - t0, 3)

    # Assimilation (dedup_media_index_assimilate, r16): price the
    # append-merge WRITE separately — the daily-job cost the lifecycle
    # exists to bound.  Built over the judged query's own day-0/day-1
    # split; re-runs are idempotent cache hits on the chained fingerprint.
    _sigs_all = _dhm(
        _mc(spark, sf_dir, "png"), max_batch_bytes=1 << 20
    ).select("media_id", "dhash").localCheckpoint(eager=True)
    _day1 = _F.expr("((media_id - media_id % 3) div 3) % 5 = 3")
    _base_dir = _dd.ensure_sig_index(
        spark, sf_dir, _sigs_all.filter(~_pred & ~_day1),
        "media_id", "dhash",
        pred_desc="triple_div3_mod5_in_0_2", kind="dhash-png",
        bits=64, n_segments=6, max_bucket_size=_MB,
        source_version=_mm.MEDIA_CORPUS_VERSION,
    )
    _wall0 = time.time()
    t0 = time.perf_counter()
    _grown = _dd.assimilate_sig_index(
        spark, _base_dir, _sigs_all.filter(_day1), "media_id", "dhash"
    )
    sigidx_assim_s = round(time.perf_counter() - t0, 3)
    # cache-hit iff the commit marker predates this call (the cache-hit
    # path touches the DIR mtime, never the marker file's)
    sigidx_assim_cached = (
        os.path.getmtime(os.path.join(_grown, "_COMMITTED")) < _wall0
    )

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    times: dict[str, float] = {}
    first_run: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for rep in range(reps):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.count()
            dt = time.perf_counter() - t0
            if rep == 0:
                first_run[name] = round(dt, 3)
            best = min(best, dt)
        times[name] = round(best, 3)

    total = round(sum(times.values()), 3)
    total_first = round(sum(first_run.values()), 3)

    # ANN quality metric: recall@3 of the IVF index against brute force.
    brute = {
        (r["q_id"], r["n_id"])
        for r in QUERIES["sim_topk"](spark, sf_dir).collect()
        if r["rk"] <= 3
    }
    ivf = {
        (r["q_id"], r["n_id"])
        for r in QUERIES["ann_ivf_topk"](spark, sf_dir).collect()
    }
    kmeans = {
        (r["q_id"], r["n_id"])
        for r in QUERIES["ann_ivf_kmeans_topk"](spark, sf_dir).collect()
    }
    rerank = {
        (r["q_id"], r["n_id"])
        for r in QUERIES["ann_ivf_rerank_topk"](spark, sf_dir).collect()
    }
    kmeans2 = {
        (r["q_id"], r["n_id"])
        for r in QUERIES["ann_ivf_kmeans2_topk"](spark, sf_dir).collect()
    }
    pq = {
        (r["q_id"], r["n_id"])
        for r in QUERIES["ann_pq_adc_topk"](spark, sf_dir).collect()
    }
    ivfpq = {
        (r["q_id"], r["n_id"])
        for r in QUERIES["ann_ivfpq_topk"](spark, sf_dir).collect()
    }
    sq8 = {
        (r["q_id"], r["n_id"])
        for r in QUERIES["ann_sq8_topk"](spark, sf_dir).collect()
        if r["rk"] <= 3
    }
    sq8rr = {
        (r["q_id"], r["n_id"])
        for r in QUERIES["ann_sq8_rerank_topk"](spark, sf_dir).collect()
        if r["rk"] <= 3
    }
    recall_sq8 = round(len(brute & sq8) / max(len(brute), 1), 3)
    recall_sq8rr = round(len(brute & sq8rr) / max(len(brute), 1), 3)
    recall_pq = round(len(brute & pq) / max(len(brute), 1), 3)
    recall_ivfpq = round(len(brute & ivfpq) / max(len(brute), 1), 3)
    recall = round(len(brute & ivf) / max(len(brute), 1), 3)
    recall_km = round(len(brute & kmeans) / max(len(brute), 1), 3)
    recall_rr = round(len(brute & rerank) / max(len(brute), 1), 3)
    recall_k2 = round(len(brute & kmeans2) / max(len(brute), 1), 3)

    # Recall-vs-scan dial: nprobe sweep over the k-means-trained index.
    # Scan fraction ≈ nprobe / #clusters (candidates probed per query).
    from mycenae_spark.functions.similarity import kmeans_refine
    from mycenae_spark.registry.llm_queries import _cent0, _ivf_search, t as _t
    from mycenae_spark.registry.util import r6

    cent = kmeans_refine(
        _t(spark, sf_dir, "embeddings"),
        _cent0(spark, sf_dir).withColumnRenamed("c_id", "vec_id"),
        iters=1, score_rounder=r6, comp_rounder=r6,
    ).localCheckpoint(eager=True)
    curve = {}
    for nprobe in (1, 2, 4, 8):
        got = {
            (r["q_id"], r["n_id"])
            for r in _ivf_search(spark, sf_dir, cent, nprobe=nprobe).collect()
        }
        curve[str(nprobe)] = round(len(brute & got) / max(len(brute), 1), 3)

    # Same dial for the IVFPQ index (VERDICT r6 item 7): recall-vs-nprobe
    # over the materialized inverted lists — the number that justifies the
    # judged default (registry/llm_queries.py::_IVFPQ_NPROBE).
    import pyspark.sql.functions as F  # noqa: N812

    u_, cb_, codes_, cent_ = _pq.load_ivfpq_index(
        spark, _pq.pq_index_dir(sf_dir, "ivfpq")
    )
    qset = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 10)
        .select("vec_id", "embedding")
    )
    ivfpq_curve = {}
    for nprobe in (1, 2, 4, 8, 16):
        got = {
            (r["q_id"], r["n_id"])
            for r in _pq.ivfpq_search(
                u_, cb_, codes_, cent_, qset, rounder=_r6, nprobe=nprobe
            ).collect()
        }
        ivfpq_curve[str(nprobe)] = round(
            len(brute & got) / max(len(brute), 1), 3
        )

    # Assimilation-chain recall drift (r16): the judged
    # ann_ivfpq_recall_drift frame, re-read here so the per-generation
    # recall@3 of the GROWN index (frozen codebook/centroids, two
    # assimilated deltas) is visible beside the single-index curves —
    # the re-train dial for the daily vector-ingest job.  The chain
    # build is priced and cache-flagged like every other artifact.
    _wall_d = time.time()
    t0 = time.perf_counter()
    drift_rows = QUERIES["ann_ivfpq_recall_drift"](spark, sf_dir).collect()
    ivfpq_drift_s = round(time.perf_counter() - t0, 3)
    drift_curve = {
        str(r["generation"]): r["recall_at_3"] for r in drift_rows
    }
    # cache-hit detection: every committed ivfpq-* marker predating the
    # drift call means no chain generation was written by it.  MUST run
    # before the retrain extra below — retraining mints its own ivfpq-*
    # marker and would read as a false drift-chain build.
    from mycenae_spark.functions.pq import _index_root as _iroot

    drift_cached = not any(
        os.path.getmtime(os.path.join(_iroot(), d, "_COMMITTED")) >= _wall_d
        for d in os.listdir(_iroot())
        if d.startswith("ivfpq-")
        and os.path.isfile(os.path.join(_iroot(), d, "_COMMITTED"))
    )

    # The re-train verb beside the drift curve: recall@3 of a generation
    # RE-TRAINED on the chain's covered corpus, over the same held-out
    # queries — the before/after the drift monitor's floor-crossing
    # decision buys.  Exact ground truth over the covered slice.
    from mycenae_spark.functions.similarity import brute_topk as _btk

    _emb = _t(spark, sf_dir, "embeddings")
    _rq = _emb.filter(F.col("vec_id") < 7).select("vec_id", "embedding")
    _rt_rows = {
        (r["q_id"], r["n_id"])
        for r in QUERIES["ann_ivfpq_retrain_topk"](spark, sf_dir).collect()
    }
    _rt_exact = {
        (r["q_id"], r["n_id"])
        for r in _btk(
            _emb.filter(F.col("vec_id") % 10 < 9), _rq, 3, score_rounder=_r6
        ).collect()
    }
    retrain_recall = round(
        len(_rt_rows & _rt_exact) / max(len(_rt_exact), 1), 3
    )

    # Lang-id quality: accuracy = confusion-matrix diagonal mass.  The
    # trigram classifier is judged by value elsewhere; the mixture extra
    # measures the FULL {1,3} form (the judged id was demoted to {3} in
    # r10 after two rounds of measured-flat delta at 2× the gram volume
    # — see text_langid_mixture's docstring) so the trigram-vs-mixture
    # comparison stays honestly visible per scale factor.
    def _cm_acc(cm):
        n_all = sum(r["n"] for r in cm)
        return round(
            sum(r["n"] for r in cm if r["lang"] == r["pred"]) / max(n_all, 1),
            3,
        )

    from mycenae_spark.registry.llm_queries import langid_mixture_confusion

    langid_acc = _cm_acc(QUERIES["text_langid_trigram"](spark, sf_dir).collect())
    langid_mix_acc = _cm_acc(
        langid_mixture_confusion(spark, sf_dir, (1, 3)).collect()
    )

    # kNN-graph quality (VERDICT r7 item 5): recall@3 of the clustered
    # single-probe and top-2-multiprobe graphs against the exact graph,
    # measured on a 1-in-10 query sample (the graph itself covers every
    # vector; the sample keeps the brute-force reference bounded).
    from mycenae_spark.functions.similarity import brute_topk

    emb = _t(spark, sf_dir, "embeddings")
    sample = emb.filter(F.col("vec_id") % 10 == 0)
    exact_graph = {
        (r["q_id"], r["n_id"])
        for r in brute_topk(emb, sample, 3, score_rounder=_r6).collect()
    }
    knn_recalls = {}
    for name in ("knn_graph_topk", "knn_graph_multiprobe"):
        got = {
            (r["vec_id"], r["n_id"])
            for r in QUERIES[name](spark, sf_dir).collect()
            if r["vec_id"] % 10 == 0
        }
        knn_recalls[name] = round(
            len(exact_graph & got) / max(len(exact_graph), 1), 3
        )

    # Perceptual-hash family comparison (r13 VERDICT item 8 convention —
    # every new signature family ships a cross-family extra): pair-set
    # Jaccard between the dHash and aHash Hamming-≤5 pair sets.  Both
    # families pair every brightness triple at distance 0 by
    # construction; the disagreement mass is the structural tail where
    # gradient-direction and above-mean signatures diverge.
    dpairs = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_image_phash"](spark, sf_dir).collect()
    }
    apairs = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_image_ahash"](spark, sf_dir).collect()
    }
    phash_agreement = round(
        len(dpairs & apairs) / max(len(dpairs | apairs), 1), 3
    )

    print(
        json.dumps(
            {
                "metric": "headline_suite_runtime",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf),
                "extras": {
                    "ann_ivf_recall_at3": recall,
                    "ann_ivf_kmeans_recall_at3": recall_km,
                    "ann_ivf_rerank_recall_at3": recall_rr,
                    "ann_ivf_kmeans2_recall_at3": recall_k2,
                    "ann_pq_adc_recall_at3": recall_pq,
                    "ann_ivfpq_recall_at3": recall_ivfpq,
                    "ann_sq8_recall_at3": recall_sq8,
                    "ann_sq8_rerank_recall_at3": recall_sq8rr,
                    "ann_pq_index_build_s": pq_build_s,
                    "ann_pq_index_was_cached": pq_cached,
                    "ann_ivfpq_index_build_s": ivfpq_build_s,
                    "band_index_build_s": band_build_s,
                    "band_index_was_cached": band_cached,
                    "langid_index_build_s": langid_build_s,
                    "langid_index_was_cached": langid_cached,
                    "media_corpus_build_s": media_builds,
                    "media_corpus_was_cached": media_cached,
                    "sig_index_build_s": sigidx_build_s,
                    "sig_index_was_cached": sigidx_cached,
                    "sig_index_assim_s": sigidx_assim_s,
                    "sig_index_assim_was_cached": sigidx_assim_cached,
                    "ann_ivfpq_index_was_cached": ivfpq_cached,
                    "ann_ivf_kmeans_recall_at3_by_nprobe": curve,
                    "ann_ivfpq_recall_at3_by_nprobe": ivfpq_curve,
                    "ann_ivfpq_drift_recall_by_gen": drift_curve,
                    "ann_ivfpq_drift_s": ivfpq_drift_s,
                    "ann_ivfpq_drift_was_cached": drift_cached,
                    "ann_ivfpq_retrain_recall_at3": retrain_recall,
                    "langid_trigram_accuracy": langid_acc,
                    "langid_mixture_accuracy": langid_mix_acc,
                    "knn_graph_recall_at3": knn_recalls["knn_graph_topk"],
                    "knn_graph_multiprobe_recall_at3": knn_recalls[
                        "knn_graph_multiprobe"
                    ],
                    "phash_dhash_pairs": len(dpairs),
                    "phash_ahash_pairs": len(apairs),
                    "phash_family_pair_jaccard": phash_agreement,
                    "bench_reps": reps,
                    "total_first_run_s": total_first,
                    # per-query first-run map (VERDICT r7 item 8): the
                    # best-of-N mask never hides a cold-path regression —
                    # future rounds diff this against the quoted map.
                    "queries_first_run": first_run,
                },
            }
        )
    )

    # LAST line, compact (r17 VERDICT item 4): the external driver
    # archives only the final ~2000 chars of stdout and json-parses the
    # last line — the full map above is ~12 KB, so cross-round mover
    # adjudication was running on whichever ~66 query names survived the
    # cut.  Full names alone are ~2.4 KB, so no named map of all
    # queries can fit: instead ``qv`` carries EVERY headline timing (2dp)
    # in NAME-SORTED order (names are deterministic — zip with
    # ``sorted(queries)`` from bench.py or any committed BENCH_LOCAL
    # map), and ``queries`` keeps the driver-contract shape with the
    # slowest entries named.  Sized to stay parseable inside the tail.
    qnames = sorted(times)
    compact = {
        "metric": "headline_suite_runtime",
        "value": total,
        "unit": "sec",
        "sf": float(sf),
        "queries": {},
        "qv_order": "name-sorted",
        "qv_n": len(qnames),
        "qv": [round(times[k], 2) for k in qnames],
    }
    for n_slow in (24, 16, 8, 4):
        slow = sorted(times.items(), key=lambda kv: -kv[1])[:n_slow]
        compact["queries"] = {k: round(v, 2) for k, v in sorted(slow)}
        line = json.dumps(compact, separators=(",", ":"))
        if len(line) <= 1850:
            break
    if len(line) > 1850:
        # last resort (r18 ADVICE): if the suite grows until the full
        # name-sorted qv array alone busts the tail budget even with
        # only 4 named queries, DROP qv rather than print an oversize
        # line the driver's 2000-char stdout tail would clip into an
        # unparseable fragment — a parseable headline + slowest-4 map
        # beats a complete-but-truncated one.  qv_n stays, so the drop
        # is visible (qv_n > 0 with qv absent).
        compact.pop("qv", None)
        compact["qv_dropped"] = "final-line over tail budget"
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
