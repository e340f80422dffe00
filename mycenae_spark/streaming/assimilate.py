"""Streaming ingest → perceptual-dedup → index-assimilation bridge.

The batch lifecycle shipped in r16 (``probe_sig_index`` →
keep-the-non-dups → ``assimilate_sig_index``) expressed as ONE
Structured Streaming job: each micro-batch of crawled media is decoded
once, probed against the CURRENT committed signature-index generation,
its verdicts are appended to a lake table, and its keeps are
append-merged into a NEW index generation — so the very next
micro-batch's probe sees everything this one kept.  This is the "full
daily loop as one streaming job" shape (NEXT.md r16 candidate 3):
point the file source at the crawler's drop directory and the dedup
index stays current without any orchestration outside Spark.

Why ``foreachBatch`` and not a stateful operator: the dedup state here
is not per-key rows in a state store — it is the committed, immutable,
partitioned index ARTIFACT (gigabytes at 100 TB scale, shared with the
batch probes and the serving endpoint).  ``foreachBatch`` is the
sanctioned hook for exactly this: transactional-ish batch writes of
derived artifacts from a stream, with the driver carrying only the
8-byte chain pointer (the current generation's directory) between
micro-batches.  Micro-batches run strictly sequentially, so
generation N+1 is always built on generation N — the same reason the
batch daily job is safe to chain.

Scale posture (unchanged from the batch verbs, which do all the real
work): decode cost ∝ |micro-batch| (one Arrow crossing,
byte-bounded batches); probe READ cost ∝ |micro-batch| × n_segments
via the (j, shard) partition filter; assimilation WRITE cost ∝ |keeps|
(hard-linked base partitions, delta-only appends); verdict writes are
plain partitioned parquet appends.  Nothing in the loop scans the
corpus, and payload bytes never cross into the driver — only the
bounded per-batch day/keep counts do.
"""

from __future__ import annotations

import logging

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

log = logging.getLogger(__name__)

#: Read-back schema of the verdict lake table written per micro-batch.
VERDICT_SCHEMA = (
    "media_id long, day int, dup_of long, n_idx_matches long, is_dup int"
)

#: Read-back schema of the ANN-bridge search-result lake table.
ANN_RESULT_SCHEMA = "day int, q_id long, n_id long, rk int, cos_r double"


def _single_day(batch: DataFrame, epoch_id: int) -> int | None:
    """The per-batch day guard both bridges share: one file = one crawl
    batch = one day.  Returns the day, or None for an empty batch; a
    batch spanning days refuses loudly (see the media bridge's sink for
    the rationale)."""
    days = [r["day"] for r in batch.select("day").distinct().collect()]
    if not days:
        return None
    if len(days) != 1:
        raise ValueError(
            f"micro-batch {epoch_id} spans days {sorted(days)}; "
            "the bridge probes-then-assimilates per batch, so each "
            "batch must be one crawl day (keep maxFilesPerTrigger=1)"
        )
    return days[0]


def media_assimilate_stream(
    spark: SparkSession,
    src_dir: str,
    base_index_dir: str,
    verdict_dir: str,
    *,
    bits: int = 64,
    n_segments: int = 6,
    max_hamming: int = 5,
    max_files_per_trigger: int = 1,
    timeout: int = 180,
) -> list[str]:
    """Run the bridge over ``src_dir`` (jsonl files of
    ``media_id long, day int, payload_b64 string`` rows — the bus/spool
    drop convention; one file per crawl batch, oldest first) until the
    backlog drains (``availableNow``).  Returns the index CHAIN: the
    base directory followed by one committed generation per micro-batch
    that kept at least one asset.  Verdicts (one row per asset:
    smallest-id index match within ``max_hamming``, match count, is_dup)
    land in ``verdict_dir`` as parquet, readable with
    :data:`VERDICT_SCHEMA`.

    Semantics contract (pinned by tests and the judged roundtrip):
    processing N files through this bridge is INDISTINGUISHABLE from
    running the batch probe → keep → assimilate verbs N times by hand —
    same signatures, same valve decisions, same verdicts, same final
    index content as a from-scratch rebuild over base ∪ all keeps.

    Undecodable / too-small payloads get a null signature from the
    decode kernel: they are verdicted as keeps (``dup_of = -1`` — no
    evidence of duplication) but ``assimilate_sig_index`` drops null
    signatures, so they never enter the index (same posture as the
    batch path).
    """
    from mycenae_spark.functions.dedup import (
        assimilate_sig_index,
        probe_sig_index,
    )
    from mycenae_spark.functions.multimodal import dhash_media
    from mycenae_spark.registry.util import await_or_raise

    chain = [base_index_dir]

    def sink(batch: DataFrame, epoch_id: int) -> None:
        day = _single_day(batch, epoch_id)
        if day is None:
            return  # empty micro-batch: nothing to verdict or assimilate
        payloads = batch.withColumn(
            "payload", F.unbase64("payload_b64")
        ).select("media_id", "payload")
        # ONE decode per micro-batch: the probe, the verdict write, and
        # the keeps' assimilation all reuse this materialized frame.
        sigs = (
            dhash_media(payloads, max_batch_bytes=1 << 20)
            .select("media_id", "dhash")
            .localCheckpoint(eager=True)
        )
        matches = probe_sig_index(
            spark, chain[-1], sigs, "media_id", "dhash",
            bits=bits, n_segments=n_segments, max_hamming=max_hamming,
        )
        agg = matches.groupBy("probe_id").agg(
            F.min("idx_id").alias("_dup_of"),
            F.count(F.lit(1)).alias("_n"),
        )
        verdicts = sigs.join(
            agg, sigs["media_id"] == agg["probe_id"], "left"
        ).select(
            "media_id",
            F.lit(day).cast("int").alias("day"),
            F.coalesce(F.col("_dup_of"), F.lit(-1)).alias("dup_of"),
            F.coalesce(F.col("_n"), F.lit(0)).alias("n_idx_matches"),
            F.when(F.col("_dup_of").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("is_dup"),
        ).localCheckpoint(eager=True)  # verdict read + keeps derivation
        verdicts.write.mode("append").parquet(verdict_dir)
        keeps = sigs.join(
            verdicts.filter(F.col("is_dup") == 1).select("media_id"),
            "media_id",
            "left_anti",
        )
        if keeps.limit(1).count() == 0:
            log.info("bridge day %s: all-dup batch, index chain unchanged",
                     day)
            return
        chain.append(
            assimilate_sig_index(spark, chain[-1], keeps, "media_id", "dhash")
        )

    stream = (
        spark.readStream.schema("media_id long, day int, payload_b64 string")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(src_dir)
    )
    await_or_raise(
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start(),
        timeout,
        "media_assimilate_stream",
    )
    return chain


def ann_assimilate_stream(
    spark: SparkSession,
    src_dir: str,
    base_index_dir: str,
    result_dir: str,
    *,
    rounder,
    k: int = 3,
    nprobe: int = 8,
    shortlist: int | None = None,
    max_files_per_trigger: int = 1,
    timeout: int = 180,
) -> list[str]:
    """The ANN twin of :func:`media_assimilate_stream` — daily VECTOR
    ingest as one streaming job: each micro-batch of
    ``vec_id long, day int, embedding array<float>`` jsonl rows is
    searched against the CURRENT committed IVFPQ generation (the
    external-vector serving form, :func:`~mycenae_spark.functions.pq.
    ivfpq_search_vectors` — incoming vectors are not in the index yet,
    so there is no self to exclude), its top-k neighbor rows land in
    ``result_dir`` as parquet (:data:`ANN_RESULT_SCHEMA`), and the whole
    batch is assimilated into a NEW generation — so the next batch's
    search already sees this batch's vectors.  Returns the index chain.

    Unlike the dedup bridge there is no keep-filter: vector ingest
    keeps everything (near-dup policy belongs to the dedup families);
    the search output is the batch's nearest-neighbor context — the
    enrichment a training pipeline attaches at ingest (labels from
    neighbors, novelty scores, cluster routing).  Scale posture: the
    search reads nprobe inverted lists per query via partition pruning,
    assimilation writes ∝ |batch| against frozen artifacts, and the
    driver carries only the generation pointer.  Compact the chain on
    the usual cadence (:func:`~mycenae_spark.functions.pq.
    compact_ivfpq_index`); re-train when the recall-drift monitor says
    so (``ann_ivfpq_recall_drift``)."""
    from mycenae_spark.functions import pq
    from mycenae_spark.registry.util import await_or_raise

    sl = pq.PQ_SHORTLIST if shortlist is None else shortlist
    chain = [base_index_dir]

    def sink(batch: DataFrame, epoch_id: int) -> None:
        day = _single_day(batch, epoch_id)
        if day is None:
            return
        vecs = batch.select("vec_id", "embedding")
        unitv, cb, codes, cent = pq.load_ivfpq_index(spark, chain[-1])
        res = pq.ivfpq_search_vectors(
            unitv, cb, codes, cent, vecs, rounder,
            nprobe=nprobe, k=k, shortlist=sl,
        ).select(
            F.lit(day).cast("int").alias("day"),
            "q_id", "n_id", "rk", "cos_r",
        )
        res.write.mode("append").parquet(result_dir)
        chain.append(
            pq.assimilate_ivfpq_index(spark, chain[-1], vecs, rounder)
        )

    stream = (
        spark.readStream.schema("vec_id long, day int, embedding array<float>")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(src_dir)
    )
    await_or_raise(
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start(),
        timeout,
        "ann_assimilate_stream",
    )
    return chain
