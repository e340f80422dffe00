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

#: Read-back schema of the text-bridge verdict lake table.
TEXT_VERDICT_SCHEMA = (
    "doc_id long, day int, dup_of long, n_idx_matches long, is_dup int"
)

#: Chain manifest filename inside the output dir — the bridge's only
#: cross-restart state besides the committed indexes themselves.
_CHAIN_MANIFEST = "_chain.json"


def read_bridge_output(spark: SparkSession, out_dir: str, schema: str):
    """Read a bridge's lake table (verdicts / ANN results): one
    ``batch_<day>/`` parquet directory per processed crawl day.  The
    explicit schema keeps an empty or partial directory readable."""
    import os

    days = sorted(
        d for d in (os.listdir(out_dir) if os.path.isdir(out_dir) else [])
        if d.startswith("batch_")
    )
    reader = spark.read.schema(schema)
    if not days:
        return spark.createDataFrame([], schema)
    return reader.parquet(*[os.path.join(out_dir, d) for d in days])


def _load_chain(out_dir: str, base_index_dir: str) -> list[dict]:
    """Recover the index chain from a previous (partial) run, or start
    fresh at the base.  Entries are ``{"dir": ..., "day": ...}`` — the
    day that PRODUCED each generation (None for the base), which is what
    lets a replayed crash-batch probe the pre-day state (see the sinks).
    Every recovered generation must still be a committed index whose
    chain starts at THIS base — a manifest for a different base (caller
    error) or a GC-swept generation refuses loudly rather than silently
    re-probing the wrong corpus state."""
    import json
    import os

    path = os.path.join(out_dir, _CHAIN_MANIFEST)
    if not os.path.isfile(path):
        return [{"dir": base_index_dir, "day": None}]
    with open(path) as fh:
        chain = json.load(fh)
    if chain[0]["dir"] != base_index_dir:
        raise ValueError(
            f"chain manifest at {path!r} starts at {chain[0]['dir']!r}, "
            f"not the requested base {base_index_dir!r} — use a fresh "
            "output dir for a different base index"
        )
    from mycenae_spark.functions.pq import _COMMIT_MARKER

    for e in chain:
        if not os.path.isfile(os.path.join(e["dir"], _COMMIT_MARKER)):
            raise FileNotFoundError(
                f"recovered chain generation {e['dir']!r} is missing or "
                "torn (GC-swept?); rebuild from the base with a fresh "
                "output dir"
            )
    return chain


def _save_chain(out_dir: str, chain: list[dict]) -> None:
    """Persist the chain manifest atomically (write + rename) so a crash
    mid-save leaves the previous manifest intact."""
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, f"{_CHAIN_MANIFEST}.tmp.{os.getpid()}")
    with open(tmp, "w") as fh:
        json.dump(chain, fh)
    os.replace(tmp, os.path.join(out_dir, _CHAIN_MANIFEST))


def _probe_state(chain: list[dict], day: int) -> str:
    """The index generation a batch for ``day`` must probe: normally the
    chain head — but if some generation was already PRODUCED by this
    very day, the batch is an at-least-once REPLAY (a crash between
    assimilation and the source-checkpoint commit, or a full re-run
    over the same output dir), and probing at-or-past that generation
    would find the batch's own keeps as duplicates of themselves.
    Replays probe the pre-day state instead, recompute byte-identical
    verdicts, and re-assimilate into a fingerprint cache hit — the
    whole loop is idempotent under replay of any prefix."""
    for i, e in enumerate(chain):
        if e["day"] == day:
            return chain[i - 1]["dir"]
    return chain[-1]["dir"]


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
    checkpoint_dir: str | None = None,
) -> list[str]:
    """Run the bridge over ``src_dir`` (jsonl files of
    ``media_id long, day int, payload_b64 string`` rows — the bus/spool
    drop convention; one file per crawl batch, oldest first) until the
    backlog drains (``availableNow``).  Returns the index CHAIN: the
    base directory followed by one committed generation per micro-batch
    that kept at least one asset.  Verdicts (one row per asset:
    smallest-id index match within ``max_hamming``, match count, is_dup)
    land in ``verdict_dir`` as parquet, readable with
    :func:`read_bridge_output` (:data:`VERDICT_SCHEMA`).

    Semantics contract (pinned by tests and the judged roundtrip):
    processing N files through this bridge is INDISTINGUISHABLE from
    running the batch probe → keep → assimilate verbs N times by hand —
    same signatures, same valve decisions, same verdicts, same final
    index content as a from-scratch rebuild over base ∪ all keeps.

    Restart discipline — ``foreachBatch`` is at-least-once, and every
    leg of this sink is idempotent under replay: verdicts write to a
    per-day ``batch_<day>/`` directory with overwrite (a replayed day
    rewrites the same deterministic rows instead of appending
    duplicates), assimilation is a cache hit on the chained content
    fingerprint (same base + same delta → the same committed
    directory), and the chain pointer persists to a manifest in
    ``verdict_dir`` after every batch so a restarted job (pass
    ``checkpoint_dir`` to resume the SOURCE position too) continues
    from the generation it actually reached instead of re-probing the
    base.  The daily loop survives a driver crash at any point.

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

    chain = _load_chain(verdict_dir, base_index_dir)

    def sink(batch: DataFrame, epoch_id: int) -> None:
        import os

        day = _single_day(batch, epoch_id)
        if day is None:
            return  # empty micro-batch: nothing to verdict or assimilate
        probe_base = _probe_state(chain, day)
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
            spark, probe_base, sigs, "media_id", "dhash",
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
        verdicts.write.mode("overwrite").parquet(
            os.path.join(verdict_dir, f"batch_{day}")  # idempotent replay
        )
        keeps = sigs.join(
            verdicts.filter(F.col("is_dup") == 1).select("media_id"),
            "media_id",
            "left_anti",
        )
        if keeps.limit(1).count() == 0:
            log.info("bridge day %s: all-dup batch, index chain unchanged",
                     day)
            _save_chain(verdict_dir, chain)
            return
        grown = assimilate_sig_index(
            spark, probe_base, keeps, "media_id", "dhash"
        )
        if all(grown != e["dir"] for e in chain):  # replay → cache hit
            chain.append({"dir": grown, "day": day})
        _save_chain(verdict_dir, chain)

    stream = (
        spark.readStream.schema("media_id long, day int, payload_b64 string")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(src_dir)
    )
    writer = stream.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    await_or_raise(writer.start(), timeout, "media_assimilate_stream")
    return [e["dir"] for e in chain]


def text_assimilate_stream(
    spark: SparkSession,
    src_dir: str,
    base_index_dir: str,
    verdict_dir: str,
    *,
    n_bands: int = 4,
    ngram: int = 3,
    max_files_per_trigger: int = 1,
    timeout: int = 180,
    checkpoint_dir: str | None = None,
) -> list[str]:
    """The TEXT member of the bridge trio (media / text / vectors) —
    daily DOCUMENT-crawl dedup as one streaming job over the minhash
    band index: each micro-batch of ``doc_id long, day int, text
    string`` jsonl rows is shingled + minhashed ONCE, probed against
    the CURRENT committed band-index generation
    (:func:`~mycenae_spark.functions.dedup.probe_band_index` — the
    delta equi-joins (band, shard, sig), the corpus is never re-read or
    re-hashed), its verdicts land in ``verdict_dir``
    (:data:`TEXT_VERDICT_SCHEMA`, read with :func:`read_bridge_output`),
    and the keeps append-merge into a NEW generation
    (:func:`~mycenae_spark.functions.dedup.assimilate_band_index`) —
    tomorrow's crawl sees today's keeps.  Returns the index chain.

    Same restart discipline as the other bridges: per-day overwrite
    writes, persisted chain manifest, replay-safe pre-day probe state,
    optional source checkpoint.  Probe parameters must match the base
    index's committed ``_params.json`` (a mismatch raises rather than
    silently missing every collision); assimilation reads its
    parameters from the same file, so the two legs cannot diverge."""
    from mycenae_spark.functions.dedup import (
        assimilate_band_index,
        probe_band_index,
    )
    from mycenae_spark.registry.util import await_or_raise

    chain = _load_chain(verdict_dir, base_index_dir)

    def sink(batch: DataFrame, epoch_id: int) -> None:
        import os

        day = _single_day(batch, epoch_id)
        if day is None:
            return
        probe_base = _probe_state(chain, day)
        # ONE shingle+minhash pass upstream of both legs: the probe and
        # the keeps' assimilation read this materialized frame.
        docs = batch.select("doc_id", "text").localCheckpoint(eager=True)
        verdicts = probe_band_index(
            spark, probe_base, docs, "doc_id", "text",
            n_bands=n_bands, ngram=ngram,
        ).select(
            "doc_id",
            F.lit(day).cast("int").alias("day"),
            "dup_of", "n_idx_matches", "is_dup",
        ).localCheckpoint(eager=True)  # verdict write + keeps derivation
        verdicts.write.mode("overwrite").parquet(
            os.path.join(verdict_dir, f"batch_{day}")  # idempotent replay
        )
        keeps = docs.join(
            verdicts.filter(F.col("is_dup") == 1).select("doc_id"),
            "doc_id",
            "left_anti",
        )
        if keeps.limit(1).count() == 0:
            log.info("text bridge day %s: all-dup batch, chain unchanged",
                     day)
            _save_chain(verdict_dir, chain)
            return
        grown = assimilate_band_index(
            spark, probe_base, keeps, "doc_id", "text"
        )
        if all(grown != e["dir"] for e in chain):  # replay → cache hit
            chain.append({"dir": grown, "day": day})
        _save_chain(verdict_dir, chain)

    stream = (
        spark.readStream.schema("doc_id long, day int, text string")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(src_dir)
    )
    writer = stream.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    await_or_raise(writer.start(), timeout, "text_assimilate_stream")
    return [e["dir"] for e in chain]


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
    checkpoint_dir: str | None = None,
) -> list[str]:
    """The ANN twin of :func:`media_assimilate_stream` — daily VECTOR
    ingest as one streaming job: each micro-batch of
    ``vec_id long, day int, embedding array<float>`` jsonl rows is
    searched against the CURRENT committed IVFPQ generation (the
    external-vector serving form, :func:`~mycenae_spark.functions.pq.
    ivfpq_search_vectors` — incoming vectors are not in the index yet,
    so there is no self to exclude), its top-k neighbor rows land in
    ``result_dir`` as parquet (read with :func:`read_bridge_output` /
    :data:`ANN_RESULT_SCHEMA`), and the whole batch is assimilated into
    a NEW generation — so the next batch's search already sees this
    batch's vectors.  Returns the index chain.

    Unlike the dedup bridge there is no keep-filter: vector ingest
    keeps everything (near-dup policy belongs to the dedup families);
    the search output is the batch's nearest-neighbor context — the
    enrichment a training pipeline attaches at ingest (labels from
    neighbors, novelty scores, cluster routing).  Same restart
    discipline as the media bridge: per-day overwrite writes, the
    persisted chain manifest, replay-safe pre-day search state
    (searching a generation that already contains the batch would
    return every vector as its own top-1), optional source checkpoint.
    Scale posture: the search reads nprobe inverted lists per query via
    partition pruning, assimilation writes ∝ |batch| against frozen
    artifacts, and the driver carries only the generation pointer.
    Compact the chain on the usual cadence
    (:func:`~mycenae_spark.functions.pq.compact_ivfpq_index`); re-train
    when the recall-drift monitor says so (``ann_ivfpq_recall_drift``)."""
    from mycenae_spark.functions import pq
    from mycenae_spark.registry.util import await_or_raise

    sl = pq.PQ_SHORTLIST if shortlist is None else shortlist
    chain = _load_chain(result_dir, base_index_dir)

    def sink(batch: DataFrame, epoch_id: int) -> None:
        import os

        day = _single_day(batch, epoch_id)
        if day is None:
            return
        search_base = _probe_state(chain, day)
        vecs = batch.select("vec_id", "embedding")
        unitv, cb, codes, cent = pq.load_ivfpq_index(spark, search_base)
        res = pq.ivfpq_search_vectors(
            unitv, cb, codes, cent, vecs, rounder,
            nprobe=nprobe, k=k, shortlist=sl,
            bulk=True,  # a crawl batch is not request-capped: nothing
            #             query-proportional may touch the driver
        ).select(
            F.lit(day).cast("int").alias("day"),
            "q_id", "n_id", "rk", "cos_r",
        )
        res.write.mode("overwrite").parquet(
            os.path.join(result_dir, f"batch_{day}")  # idempotent replay
        )
        grown = pq.assimilate_ivfpq_index(spark, search_base, vecs, rounder)
        if all(grown != e["dir"] for e in chain):  # replay → cache hit
            chain.append({"dir": grown, "day": day})
        _save_chain(result_dir, chain)

    stream = (
        spark.readStream.schema("vec_id long, day int, embedding array<float>")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(src_dir)
    )
    writer = stream.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    await_or_raise(writer.start(), timeout, "ann_assimilate_stream")
    return [e["dir"] for e in chain]
