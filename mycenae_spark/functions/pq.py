"""Product-quantization ANN: train / encode / ADC search, plus a
MATERIALIZED index (build once, search many).

Pipeline (the standard PQ design — ADC generates candidates, exact math
ranks them):

* **Train**: unit-normalize each 64-dim embedding (partial dots then sum to
  the cosine brute force ranks on), split into M=16 subspaces of 4 dims;
  per subspace train a codebook — deterministic seeds (every ``seed_mod``-th
  vector's slice) tightened by one per-subspace Lloyd recenter.
* **Encode**: nearest codebook entry per (vector, subspace) — a ``min_by``
  hash aggregation (partial-aggregating argmin), never a window sort of the
  #vectors × M × |codebook| frame.
* **Search**: per query, an M × |codebook| partial-dot lookup table (tiny,
  broadcast); a candidate's approximate cosine is M lookups + a sum — no
  raw-vector math, no corpus shuffle (codes join the broadcast LUT).  The
  ADC shortlist is re-ranked by exact cosine.

Scale (100 TB): a vector becomes M small codes — at a dense 256-entry
codebook, 16 bytes instead of 256: the 16× compression that keeps the
candidate representation resident while raw vectors stay in parquet.  The
**materialized index** completes the story: in a real deployment the
codebook/codes are built once and amortized across every query, so
``ensure_pq_index`` persists them (plus the unit vectors the re-rank needs)
as parquet and commits with an atomic directory rename — the same
CAS-by-rename discipline as the lake's commit log (streaming/commitlog.py).
Concurrent builders race benignly: the build is deterministic, losers
delete their staging directory and read the winner's.

All steps are built-in expressions (zip_with / aggregate / min_by /
transform) — Catalyst-optimizable, DuckDB-mirrorable, no UDFs.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import uuid
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from mycenae_spark.functions.similarity import dot, with_norm
from mycenae_spark.sources.tables import explode_ne

PQ_M, PQ_SUB = 16, 4  # 16 subspaces × 4 dims = the 64-dim embedding
PQ_SHORTLIST = 50     # ADC candidates exact-re-ranked per query

Rounder = Callable[[Column], Column]


def unit_embeddings(e: DataFrame) -> DataFrame:
    """``(vec_id, ue)`` — embeddings scaled to unit L2 norm (as double).

    The norm is computed ONCE per vector (``with_norm``) and referenced
    from the per-element transform; inlining the 64-term norm expression
    into the lambda would do O(d²) work per vector on the index-build
    path.  Same double division, so values (and oracle hashes) are
    unchanged."""
    return with_norm(e, "embedding").select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x.cast("double") / F.col("_norm")
        ).alias("ue"),
    )


def sub_slices(unitv: DataFrame, id_alias: str, out: str) -> DataFrame:
    """Explode ``(vec_id, ue)`` into ``(id_alias, s, out)`` subspace slices."""
    return unitv.select(
        F.col("vec_id").alias(id_alias),
        explode_ne(  # literal-length (PQ_M) slice array — non-empty
            F.array(*[
                F.struct(
                    F.lit(s).alias("s"),
                    F.slice("ue", s * PQ_SUB + 1, PQ_SUB).alias(out),
                )
                for s in range(PQ_M)
            ])
        ).alias("_x"),
    ).select(id_alias, "_x.s", f"_x.{out}")


def _l2(rounder: Rounder) -> Column:
    return rounder(
        F.aggregate(
            F.zip_with(F.col("ve"), F.col("ce"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def encode(vsub: DataFrame, cb: DataFrame, rounder: Rounder) -> DataFrame:
    """Assign each (vector, subspace) slice its nearest codebook entry.

    argmin via ``min_by`` over the total-order (dist, code) struct — a
    partial-aggregating hash agg, not a full sort of the
    #vectors × M × |codebook| join (the hot frame).
    """
    return (
        vsub.join(F.broadcast(cb), "s")
        .withColumn("_d_r", _l2(rounder))
        .groupBy("vec_id", "s")
        .agg(F.min_by("code", F.struct("_d_r", "code")).alias("code"))
    )


def build_pq(
    unitv: DataFrame, rounder: Rounder, seed_mod: int = 50
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train codebooks + encode the corpus; returns ``(vsub, cb, codes)``.

    Seeds are every ``seed_mod``-th vector's slices (corpus-derived sizing,
    like the IVF seeds), tightened by ONE per-subspace Lloyd recenter.  The
    codebook is localCheckpointed — it is reused by encode + every search
    LUT, and recomputing the recenter lineage would double the build.  The
    sliced corpus is too: three consumers (seed encode, recenter, final
    encode) would otherwise each re-scan the parquet and re-explode the
    slices (~10% of the build warm, more cold).
    """
    vsub = sub_slices(unitv, "vec_id", "ve").localCheckpoint(eager=True)
    cb0 = sub_slices(unitv.filter(F.col("vec_id") % seed_mod == 0), "code", "ce")
    cb = (
        vsub.join(encode(vsub, cb0, rounder), ["vec_id", "s"])
        .select("s", "code", F.posexplode("ve").alias("_j", "_x"))
        .groupBy("s", "code", "_j")
        .agg(rounder(F.avg("_x")).alias("_m"))
        .groupBy("s", "code")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_j", "_m"))),
                lambda st: st["_m"],
            ).alias("ce")
        )
    )
    cb = cb.localCheckpoint(eager=True)
    codes = encode(vsub, cb, rounder)
    return vsub, cb, codes


def _query_lut(
    qunitv: DataFrame, cb: DataFrame, rounder: Rounder
) -> DataFrame:
    """Per-query (q_id, s, code, pdot_r) partial-dot lookup table (tiny).

    ``qunitv`` is a unitv-shaped (vec_id, ue) query frame — a filtered
    slice of the corpus unitv for the judged corpus-query paths, or the
    unit-normalized posted vectors for the serving path."""
    qsub = sub_slices(qunitv, "q_id", "ve")
    return qsub.join(F.broadcast(cb), "s").select(
        "q_id", "s", "code", rounder(dot(F.col("ve"), F.col("ce"))).alias("pdot_r")
    )


def _exact_rerank(
    short: DataFrame,
    unitv: DataFrame,
    qunitv: DataFrame,
    rounder: Rounder,
    k: int,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact-cosine re-rank of a (q_id, n_id) shortlist to top-k.

    Single-sourced for all three search paths (adc_search, ivfpq_search,
    ivfpq_search_vectors) the way the oracle single-sources its rerank
    tail (_PQ_RERANK_TAIL) — the tie-break and rounding cannot drift
    between variants.  ``qunitv`` as in :func:`_query_lut`.
    ``broadcast_queries=False`` is the BULK regime (see
    :func:`ivfpq_search_vectors`): the query frame scales with the
    batch, so the join strategy is left to Catalyst/AQE instead of
    being forced driver-side."""
    uq = qunitv.select(
        F.col("vec_id").alias("q_id"), F.col("ue").alias("_uq")
    )
    if broadcast_queries:
        uq = F.broadcast(uq)
    un = unitv.select(F.col("vec_id").alias("n_id"), F.col("ue").alias("_un"))
    w_rank = Window.partitionBy("q_id").orderBy(F.desc("cos_r"), "n_id")
    return (
        short.join(uq, "q_id")
        .join(un, "n_id")
        .withColumn("cos_r", rounder(dot(F.col("_uq"), F.col("_un"))))
        .withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "rk", "cos_r")
    )


def _ivf_adc_shortlist(
    pruned: DataFrame,
    probe_pairs: DataFrame,
    lut: DataFrame,
    rounder: Rounder,
    shortlist: int,
    exclude_self: bool,
    broadcast_queries: bool = True,
) -> DataFrame:
    """IVF-scoped ADC shortlist — the probed-lists → per-query-LUT →
    top-``shortlist`` stage shared by the corpus-query and
    external-vector searches.  ``exclude_self`` drops n_id == q_id
    (corpus queries: a vector is trivially its own neighbor); the
    serving path keeps it (client ids are a different namespace and the
    identical corpus item IS the lookup answer).
    ``broadcast_queries=False``: probe pairs and the LUT scale with the
    query batch — in the bulk regime they join unforced (AQE picks)."""
    w_short = Window.partitionBy("q_id").orderBy(F.desc("adc_r"), "n_id")
    pp = F.broadcast(probe_pairs) if broadcast_queries else probe_pairs
    s = pruned.withColumnRenamed("vec_id", "n_id").join(pp, "c_id")
    if exclude_self:
        s = s.filter(F.col("n_id") != F.col("q_id"))
    return (
        s.join(F.broadcast(lut) if broadcast_queries else lut,
               ["q_id", "s", "code"])
        .groupBy("q_id", "n_id")
        .agg(rounder(F.sum("pdot_r")).alias("adc_r"))
        .withColumn("_srn", F.row_number().over(w_short))
        .filter(F.col("_srn") <= shortlist)
        .select("q_id", "n_id")
    )


def adc_search(
    unitv: DataFrame,
    cb: DataFrame,
    codes: DataFrame,
    query_pred: Column,
    rounder: Rounder,
    k: int = 3,
    shortlist: int = PQ_SHORTLIST,
) -> DataFrame:
    """ADC shortlist + exact re-rank → ``(q_id, n_id, rk, cos_r)``.

    The LUT (queries × M × |codebook| partial dots) and the query vectors
    are broadcast; the corpus side (codes, unit vectors) never shuffles.
    """
    qunitv = unitv.filter(query_pred)
    lut = _query_lut(qunitv, cb, rounder)

    w_short = Window.partitionBy("q_id").orderBy(F.desc("adc_r"), "n_id")
    short = (
        codes.withColumnRenamed("vec_id", "n_id")
        .join(F.broadcast(lut), ["s", "code"])
        .filter(F.col("n_id") != F.col("q_id"))
        .groupBy("q_id", "n_id")
        .agg(rounder(F.sum("pdot_r")).alias("adc_r"))
        .withColumn("_srn", F.row_number().over(w_short))
        .filter(F.col("_srn") <= shortlist)
        .select("q_id", "n_id")
    )
    return _exact_rerank(short, unitv, qunitv, rounder, k)


# ------------------------------------------------------- materialized index

INDEX_TABLES = ("unitv", "codebook", "codes")
IVFPQ_TABLES = ("unitv", "codebook", "codes", "centroids")
_COMMIT_MARKER = "_COMMITTED"

#: Bump when build_pq / coarse-assign semantics change: the version is part
#: of the index fingerprint, so new code never silently serves an index
#: built by an older algorithm.
PQ_BUILD_VERSION = 2


def _pq_params(seed_mod: int) -> str:
    return f"seed{seed_mod}"


def _ivfpq_params(seed_mod: int, cent_mod: int) -> str:
    return f"seed{seed_mod}|cent{cent_mod}"


def index_is_committed(index_dir: str) -> bool:
    """True iff ``index_dir`` holds a fully committed index."""
    return os.path.isfile(os.path.join(index_dir, _COMMIT_MARKER))


def _index_root() -> str:
    return os.environ.get(
        "MYCENAE_INDEX_ROOT",
        os.path.join(tempfile.gettempdir(), "mycenae_pq_index"),
    )


def fingerprint_tree(h, src: str) -> None:
    """Fold the stat-identity of ``src`` (a data file, or a directory
    walked sorted) into hash object ``h``: (relative path, size,
    mtime_ns) per file — cheap stat calls, never a data read.  THE one
    staleness-detection walk shared by every materialized artifact
    family (PQ/IVFPQ codes, the minhash band index, the langid
    profiles); a regenerated source dir mints a new artifact in all of
    them, and a future change to the walk (symlinks, hashing scheme)
    lands once (review finding — three verbatim copies had grown)."""
    if os.path.isdir(src):
        for base, _dirs, files in sorted(os.walk(src)):
            for f in sorted(files):
                p = os.path.join(base, f)
                st = os.stat(p)
                rel = os.path.relpath(p, src)
                h.update(f"|{rel}|{st.st_size}|{st.st_mtime_ns}".encode())
    else:
        st = os.stat(src)
        h.update(f"|{st.st_size}|{st.st_mtime_ns}".encode())


def pq_index_fingerprint(
    sf_dir: str, variant: str = "pq", params: str | None = None
) -> str:
    """Content fingerprint of the embeddings table + index parameters.

    Hashes every data file's stat identity (``fingerprint_tree``) so a
    regenerated testdata dir (the r4/r5 outage mode) gets a NEW index
    instead of silently serving stale codes.  The build VERSION and
    build parameters (seed/centroid moduli) are part of the hash too: a
    parameter change or an algorithm change mints a new index directory
    instead of silently serving codes built differently from what the
    caller (and the shared oracle) expects.
    """
    if params is None:
        params = _pq_params(50) if variant == "pq" else _ivfpq_params(50, 100)
    src = os.path.join(sf_dir.rstrip("/"), "embeddings.parquet")
    h = hashlib.md5(
        f"v{PQ_BUILD_VERSION}|{variant}|M{PQ_M}|SUB{PQ_SUB}|{params}|"
        f"{os.path.abspath(src)}".encode()
    )
    fingerprint_tree(h, src)
    return h.hexdigest()[:16]


def pq_index_dir(
    sf_dir: str, variant: str = "pq", params: str | None = None
) -> str:
    return os.path.join(
        _index_root(), pq_index_fingerprint(sf_dir, variant, params)
    )


def _commit_index(dest: str, staging: str, fingerprint: str) -> str:
    """Atomic CAS-by-rename commit of a staged index directory.

    The marker is written LAST inside staging, then one ``os.rename``
    publishes everything.  A concurrent builder that loses the rename race
    deletes its staging dir and uses the winner's — equivalent by
    deterministic construction.  Readers only ever trust a directory
    containing the marker, so a torn build (crash mid-write) is invisible,
    never half-read.
    """
    with open(os.path.join(staging, _COMMIT_MARKER), "w") as fh:
        fh.write(fingerprint)
    os.makedirs(_index_root(), exist_ok=True)
    try:
        os.rename(staging, dest)
    except OSError:
        shutil.rmtree(staging, ignore_errors=True)
        if not os.path.isfile(os.path.join(dest, _COMMIT_MARKER)):
            raise
    return dest


def _touch_index(index_dir: str) -> None:
    """Bump the index dir's mtime: parquet READS don't update it, so without
    this an actively-queried index older than the GC age would be swept out
    from under a concurrent search (the eviction signal is use, not build
    time)."""
    try:
        os.utime(index_dir)
    except OSError:
        pass  # concurrently swept / read-only root — the read itself decides


def _load_index(
    spark: SparkSession, index_dir: str, tables: tuple[str, ...]
) -> tuple[DataFrame, ...]:
    if not os.path.isfile(os.path.join(index_dir, _COMMIT_MARKER)):
        raise FileNotFoundError(
            f"PQ index at {index_dir!r} has no {_COMMIT_MARKER}; "
            "refusing to read a torn build"
        )
    _touch_index(index_dir)
    return tuple(
        spark.read.parquet(os.path.join(index_dir, name)) for name in tables
    )


def ensure_pq_index(
    spark: SparkSession, sf_dir: str, rounder: Rounder, seed_mod: int = 50
) -> str:
    """Build-and-commit the PQ index for ``sf_dir`` if absent; return its dir."""
    from mycenae_spark.sources.tables import load_table

    params = _pq_params(seed_mod)
    dest = pq_index_dir(sf_dir, "pq", params)
    if index_is_committed(dest):
        _touch_index(dest)
        return dest

    staging = f"{dest}.build-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    try:
        unitv = unit_embeddings(load_table(spark, sf_dir, "embeddings"))
        _vsub, cb, codes = build_pq(unitv, rounder, seed_mod=seed_mod)
        unitv.write.parquet(os.path.join(staging, "unitv"))
        cb.write.parquet(os.path.join(staging, "codebook"))
        codes.write.parquet(os.path.join(staging, "codes"))
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)  # no orphaned staging
        raise
    return _commit_index(dest, staging, pq_index_fingerprint(sf_dir, "pq", params))


def load_pq_index(
    spark: SparkSession, index_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Read a committed index → ``(unitv, codebook, codes)`` DataFrames."""
    return _load_index(spark, index_dir, INDEX_TABLES)


def ensure_ivfpq_index(
    spark: SparkSession,
    sf_dir: str,
    rounder: Rounder,
    seed_mod: int = 50,
    cent_mod: int = 100,
    pred: Column | None = None,
    pred_desc: str = "",
) -> str:
    """Build-and-commit the IVF+PQ index: PQ codes stored as INVERTED LISTS.

    FAISS's IVFPQ layout re-expressed as a lake table: each vector is
    coarse-assigned to its nearest IVF centroid (cosine, broadcast
    centroids), and the codes table is written ``partitionBy("c_id")`` —
    one parquet partition per inverted list.  A search that probes nprobe
    clusters therefore reads ``nprobe / #clusters`` of the codes table via
    plain partition pruning — the directory IS the index structure, no
    bespoke storage engine needed.  At 100 TB with ~1M centroids this is
    the difference between scanning terabytes of codes and tens of
    megabytes."""
    from mycenae_spark.sources.tables import load_table

    # ``pred`` scopes the CORPUS SLICE the index covers (the assimilation
    # base's day-0 shape); pred_desc names it in the fingerprint so a
    # different slice mints a different directory.
    if (pred is None) != (pred_desc == ""):
        raise ValueError("pred and pred_desc must be provided together")
    params = _ivfpq_params(seed_mod, cent_mod) + (
        f"|pred{pred_desc}" if pred_desc else ""
    )
    dest = pq_index_dir(sf_dir, "ivfpq", params)
    if index_is_committed(dest):
        _touch_index(dest)
        return dest

    staging = f"{dest}.build-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    try:
        e = load_table(spark, sf_dir, "embeddings")
        if pred is not None:
            e = e.filter(pred)
        unitv = unit_embeddings(e)
        _vsub, cb, codes = build_pq(unitv, rounder, seed_mod=seed_mod)

        from mycenae_spark.functions.similarity import ivf_assign

        cent = e.filter(F.col("vec_id") % cent_mod == 0).select(
            F.col("vec_id").alias("c_id"), "embedding"
        )
        assign = ivf_assign(
            e, cent.select(F.col("c_id").alias("vec_id"), "embedding"),
            score_rounder=rounder,
        )
        unitv.write.parquet(os.path.join(staging, "unitv"))
        cb.write.parquet(os.path.join(staging, "codebook"))
        cent.write.parquet(os.path.join(staging, "centroids"))
        (
            codes.join(assign, "vec_id")
            .repartition("c_id")
            .write.partitionBy("c_id")
            .parquet(os.path.join(staging, "codes"))
        )
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)  # no orphaned staging
        raise
    return _commit_index(
        dest, staging, pq_index_fingerprint(sf_dir, "ivfpq", params)
    )


def load_ivfpq_index(
    spark: SparkSession, index_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Read a committed IVFPQ index → ``(unitv, cb, codes+c_id, centroids)``."""
    return _load_index(spark, index_dir, IVFPQ_TABLES)


def _link_tree(src_root: str, dst_root: str) -> None:
    """Hard-link one committed index table into a staging dir (parquet
    directories compose by listing, so linked base files + newly written
    files read as one table).  Falls back to a copy when the index root
    spans filesystems (EXDEV)."""
    for base, _dirs, files in os.walk(src_root):
        rel = os.path.relpath(base, src_root)
        dst = dst_root if rel == "." else os.path.join(dst_root, rel)
        os.makedirs(dst, exist_ok=True)
        for f in files:
            if f == "_SUCCESS" and os.path.exists(os.path.join(dst, f)):
                continue
            try:
                os.link(os.path.join(base, f), os.path.join(dst, f))
            except OSError:
                shutil.copy2(os.path.join(base, f), os.path.join(dst, f))


def assimilate_ivfpq_index(
    spark: SparkSession,
    base_dir: str,
    delta: DataFrame,
    rounder: Rounder,
) -> str:
    """Grow a committed IVFPQ index by a delta vector batch WITHOUT a
    rebuild — FAISS ``add()`` semantics as a lake operation, closing the
    incremental lifecycle at the ANN family the way
    ``assimilate_sig_index`` closed it at dedup: the codebook and IVF
    centroids are FROZEN per index generation (deliberately NOT
    retrained — that is what makes this an append, and what the drift
    re-train cadence is for), the delta's vectors are unit-normalized,
    PQ-encoded against the frozen codebook, coarse-assigned to the
    frozen centroids, and their unitv + codes rows APPEND as new parquet
    files beside the base tables' hard-linked files (codebook/centroids
    link verbatim).  Write cost ∝ |delta|; the base is never mutated
    (immutable CAS chain, idempotent chained fingerprint).

    Search-equivalence contract (judged: the grown index must answer
    exactly like an index whose TRAINING saw only the base corpus but
    whose codes/unitv cover base ∪ delta — the oracle states precisely
    that): encode and assign are deterministic given the frozen
    artifacts, so assimilation is invisible relative to that reference.
    ``delta`` is a raw ``(vec_id, embedding)`` frame; ids must not
    collide with corpus ids (the caller's contract, same as ingest)."""
    import hashlib

    from mycenae_spark.functions.similarity import ivf_assign

    marker = os.path.join(base_dir, _COMMIT_MARKER)
    if not os.path.isfile(marker):
        raise FileNotFoundError(
            f"IVFPQ index at {base_dir!r} has no {_COMMIT_MARKER}; "
            "refusing to assimilate into a torn build"
        )
    _touch_index(base_dir)  # assimilation is a USE for the GC age-out
    with open(marker) as fh:
        base_fp = fh.read().strip()

    dunit = unit_embeddings(delta).localCheckpoint(eager=True)
    stat = dunit.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.xxhash64(F.col("vec_id"), F.col("ue")).cast("decimal(38,0)")
        ).alias("h"),
    ).collect()[0]
    fp = hashlib.md5(
        f"ivfpq-assim-v{PQ_BUILD_VERSION}|{base_fp}|n{stat['n']}"
        f"|h{stat['h']}".encode()
    ).hexdigest()[:16]
    dest = os.path.join(_index_root(), f"ivfpq-{fp}")
    if index_is_committed(dest):
        _touch_index(dest)
        return dest

    _unitv, cb, _codes, cent = load_ivfpq_index(spark, base_dir)
    dsub = sub_slices(dunit, "vec_id", "ve")
    dcodes = encode(dsub, cb, rounder)
    dassign = ivf_assign(
        delta, cent.select(F.col("c_id").alias("vec_id"), "embedding"),
        score_rounder=rounder,
    )

    staging = f"{dest}.build-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    try:
        dunit.write.parquet(os.path.join(staging, "unitv"))
        (
            dcodes.join(dassign, "vec_id")
            .repartition("c_id")
            .write.partitionBy("c_id")
            .parquet(os.path.join(staging, "codes"))
        )

        # base rows compose with the delta file (unitv/codes); the frozen
        # artifacts (codebook/centroids) link verbatim
        for name in ("unitv", "codes", "codebook", "centroids"):
            _link_tree(
                os.path.join(base_dir, name), os.path.join(staging, name)
            )
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    return _commit_index(dest, staging, fp)


def compact_ivfpq_index(spark: SparkSession, base_dir: str) -> str:
    """Compact an IVFPQ assimilation CHAIN back to dense files — the ANN
    twin of :func:`~mycenae_spark.functions.dedup.compact_sig_index`:
    every :func:`assimilate_ivfpq_index` generation appends one more
    parquet file to ``unitv/`` and to each touched ``codes/c_id=*/``
    inverted list, so after N daily vector batches a search's
    partition-pruned codes read lists-and-opens N files per probed list
    and the rerank's unitv scan opens N files.  Compaction rewrites the
    codes table to ONE file per inverted list (repartition on the
    partition key — the directory layout IS the index structure, so
    this is a pure physical change) and the unitv table to
    ~128 MB-target files, links the frozen codebook/centroids verbatim,
    and commits a NEW immutable CAS directory.  Searching the compacted
    index is INDISTINGUISHABLE from searching the chain (same rows,
    pytest-pinned and judged via the shared assimilation oracle).
    Idempotent: the fingerprint chains deterministically off the
    base's, so re-compacting is a cache hit.  Run on the re-train
    cadence's off-weeks (or when files-per-list crosses a threshold);
    searches in between pay at most chain-length file opens."""
    marker = os.path.join(base_dir, _COMMIT_MARKER)
    if not os.path.isfile(marker):
        raise FileNotFoundError(
            f"IVFPQ index at {base_dir!r} has no {_COMMIT_MARKER}; "
            "refusing to compact a torn build"
        )
    _touch_index(base_dir)  # compaction is a USE for the GC age-out
    with open(marker) as fh:
        base_fp = fh.read().strip()
    fp = hashlib.md5(
        f"ivfpq-compact-v{PQ_BUILD_VERSION}|{base_fp}".encode()
    ).hexdigest()[:16]
    dest = os.path.join(_index_root(), f"ivfpq-{fp}")
    if index_is_committed(dest):
        _touch_index(dest)
        return dest

    unitv, _cb, codes, _cent = load_ivfpq_index(spark, base_dir)
    # unitv target file count from the chain's on-disk bytes (the local
    # index root is a plain filesystem path — the same invariant the
    # hard-link composition relies on)
    ubytes = sum(
        os.path.getsize(os.path.join(b, f))
        for b, _d, fs in os.walk(os.path.join(base_dir, "unitv"))
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-ubytes // (128 << 20)))  # ceil-div, ≥ 1

    staging = f"{dest}.build-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    try:
        unitv.repartition(n_files).write.parquet(
            os.path.join(staging, "unitv")
        )
        codes.repartition(F.col("c_id")).write.partitionBy("c_id").parquet(
            os.path.join(staging, "codes")
        )
        for name in ("codebook", "centroids"):
            _link_tree(
                os.path.join(base_dir, name), os.path.join(staging, name)
            )
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    return _commit_index(dest, staging, fp)


def retrain_ivfpq_index(
    spark: SparkSession,
    chain_dir: str,
    rounder: Rounder,
    seed_mod: int = 50,
    cent_mod: int = 100,
) -> str:
    """Cut a NEW TRAINED generation from an assimilation chain — the
    verb the recall-drift monitor (``ann_ivfpq_recall_drift``) exists to
    trigger: assimilation deliberately freezes the codebook and IVF
    centroids, so after enough deltas the quantizer was fit to a corpus
    that no longer exists; re-training rebuilds BOTH from the chain's
    own covered corpus and re-encodes every vector against them.

    Trains from the ARTIFACT, not the source table: the chain's
    ``unitv`` (base ∪ every assimilated delta, unit-normalized at
    ingest) is the one complete record of what the index covers — a
    streamed delta may exist nowhere else.  Consequently every cosine
    in the new generation's coarse structure is computed over UNIT
    vectors (scale-invariant mathematically; pinned as the contract so
    the oracle states the same arithmetic).  Seeds and centroids follow
    the corpus-derived mod rules on the covered ids (every
    ``seed_mod``-th / ``cent_mod``-th vector), the same sizing rule the
    original build used.  Committed as a new immutable CAS directory;
    idempotent by chained fingerprint; the old chain stays readable for
    in-flight searches (the generation-pointer swap is the caller's one
    atomic step, exactly as with assimilation)."""
    from mycenae_spark.functions.similarity import ivf_assign

    marker = os.path.join(chain_dir, _COMMIT_MARKER)
    if not os.path.isfile(marker):
        raise FileNotFoundError(
            f"IVFPQ index at {chain_dir!r} has no {_COMMIT_MARKER}; "
            "refusing to retrain from a torn build"
        )
    _touch_index(chain_dir)  # retraining is a USE for the GC age-out
    with open(marker) as fh:
        base_fp = fh.read().strip()
    fp = hashlib.md5(
        f"ivfpq-retrain-v{PQ_BUILD_VERSION}|s{seed_mod}|c{cent_mod}"
        f"|{base_fp}".encode()
    ).hexdigest()[:16]
    dest = os.path.join(_index_root(), f"ivfpq-{fp}")
    if index_is_committed(dest):
        _touch_index(dest)
        return dest

    unitv, _cb, _codes, _cent = load_ivfpq_index(spark, chain_dir)
    unitv = unitv.localCheckpoint(eager=True)  # 4 consumers below
    _vsub, cb, codes = build_pq(unitv, rounder, seed_mod=seed_mod)
    # unit vectors play the embedding role from here on (the documented
    # contract): |ue| = 1, so cosine values are unchanged up to float
    # noise, and BOTH engines compute the same formula on the same ue.
    eue = unitv.select("vec_id", F.col("ue").alias("embedding"))
    cent = eue.filter(F.col("vec_id") % cent_mod == 0).select(
        F.col("vec_id").alias("c_id"), "embedding"
    )
    assign = ivf_assign(
        eue, cent.select(F.col("c_id").alias("vec_id"), "embedding"),
        score_rounder=rounder,
    )
    staging = f"{dest}.build-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    try:
        unitv.write.parquet(os.path.join(staging, "unitv"))
        cb.write.parquet(os.path.join(staging, "codebook"))
        cent.write.parquet(os.path.join(staging, "centroids"))
        (
            codes.join(assign, "vec_id")
            .repartition("c_id")
            .write.partitionBy("c_id")
            .parquet(os.path.join(staging, "codes"))
        )
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    return _commit_index(dest, staging, fp)


def ivfpq_search(
    unitv: DataFrame,
    cb: DataFrame,
    codes: DataFrame,
    cent: DataFrame,
    queries: DataFrame,
    rounder: Rounder,
    nprobe: int = 4,
    k: int = 3,
    shortlist: int = PQ_SHORTLIST,
) -> DataFrame:
    """IVF-probe → partition-pruned ADC → exact re-rank.

    ``queries`` is the raw ``(vec_id, embedding)`` query set (bounded).
    Probe selection broadcasts the centroids against it; the probe result
    is collected ONCE (#queries × nprobe pairs — driver-bounded by
    contract, the FAISS "select inverted lists" step) and reused three
    ways: the cluster ids become a partition filter on the codes scan (so
    only probed lists are ever read), the (q_id, c_id) pairs re-enter the
    plan as a broadcast local relation (no re-execution of the probe
    cross-join), and the query ids scope the LUT and the re-rank.  ADC
    joins the pruned codes against the broadcast per-query LUT, and the
    shortlist is exact-re-ranked from the unit vectors."""
    from mycenae_spark.functions.similarity import cosine, with_norm

    cw = with_norm(cent, "embedding").select(
        "c_id", F.col("embedding").alias("_ce"), F.col("_norm").alias("_cn")
    )
    qn = with_norm(queries, "embedding")
    w_probe = Window.partitionBy("vec_id").orderBy(F.desc("_cos_r"), "c_id")
    probes = (
        qn.crossJoin(F.broadcast(cw))
        .withColumn(
            "_cos_r",
            rounder(
                cosine(F.col("embedding"), F.col("_ce"), F.col("_norm"), F.col("_cn"))
            ),
        )
        .withColumn("_rn", F.row_number().over(w_probe))
        .filter(F.col("_rn") <= nprobe)
        .select(F.col("vec_id").alias("q_id"), "c_id")
    )
    probe_rows = [(r["q_id"], r["c_id"]) for r in probes.collect()]
    probed_lists = sorted({c for _q, c in probe_rows})
    query_pred = F.col("vec_id").isin(sorted({q for q, _c in probe_rows}))
    # (q_id, c_id) scoping joined per-code-row: a code row in list c_id is
    # a candidate ONLY for queries that probed c_id.  Rebuilt from the
    # collected rows as a local relation — broadcasting `probes` itself
    # would re-execute the probe cross-join inside the search DAG.
    probe_pairs = unitv.sparkSession.createDataFrame(
        probe_rows, "q_id long, c_id long"
    )

    qunitv = unitv.filter(query_pred)
    lut = _query_lut(qunitv, cb, rounder)
    pruned = codes.filter(F.col("c_id").isin(probed_lists))
    short = _ivf_adc_shortlist(
        pruned, probe_pairs, lut, rounder, shortlist, exclude_self=True
    )
    return _exact_rerank(short, unitv, qunitv, rounder, k)


def ivfpq_search_vectors(
    unitv: DataFrame,
    cb: DataFrame,
    codes: DataFrame,
    cent: DataFrame,
    qvecs: DataFrame,
    rounder: Rounder,
    nprobe: int = 4,
    k: int = 3,
    shortlist: int = PQ_SHORTLIST,
    candidate_ids: DataFrame | None = None,
    bulk: bool = False,
) -> DataFrame:
    """:func:`ivfpq_search` for EXTERNAL query vectors — the serving
    shape: the query set is a bounded batch of client-posted
    ``(vec_id, embedding)`` rows that need NOT exist in the corpus, so
    the LUT and the exact re-rank derive the query side from the posted
    vectors (unit-normalized with the corpus's own convention,
    :func:`unit_embeddings`) instead of from ``unitv``.  Two deliberate
    semantic differences from the corpus-query form: no self-exclusion
    (a client id is a client-chosen label in a DIFFERENT namespace from
    corpus vec_ids — excluding an unrelated corpus neighbor that happens
    to share the integer would silently drop a true match; finding the
    identical corpus item IS the lookup use-case), and every returned
    ``n_id`` is a corpus id.

    Two regimes, identical results (pinned by test):

    * **Serving** (default): the query batch is request-capped, so the
      (q_id, c_id) probe pairs collect driver-side and re-enter as a
      broadcast local relation, and the per-query LUT / rerank vectors
      broadcast — the low-latency plan.
    * **Bulk** (``bulk=True`` — the streaming-ingest bridge's daily
      crawl, where a batch can be millions of vectors): NOTHING
      query-proportional touches the driver or a broadcast.  Only the
      distinct probed list ids collect (bounded by the CENTROID count,
      not the batch); the probe pairs materialize once
      (``localCheckpoint`` — same reason the serving path rebuilds them
      as a local relation: the probe cross-join must not re-execute
      inside the search DAG) and join unforced, as do the LUT and the
      rerank query vectors — Catalyst/AQE picks broadcast vs shuffle
      from actual sizes."""
    qunit = unit_embeddings(qvecs)
    cw = with_norm(cent, "embedding").select(
        "c_id", F.col("embedding").alias("_ce"), F.col("_norm").alias("_cn")
    )
    # |ue| = 1 by construction, so cosine(q, c) = dot(ue, ce)/|ce|
    w_probe = Window.partitionBy("vec_id").orderBy(F.desc("_cos_r"), "c_id")
    probes = (
        qunit.crossJoin(F.broadcast(cw))
        .withColumn(
            "_cos_r",
            rounder(dot(F.col("ue"), F.col("_ce")) / F.col("_cn")),
        )
        .withColumn("_rn", F.row_number().over(w_probe))
        .filter(F.col("_rn") <= nprobe)
        .select(F.col("vec_id").alias("q_id"), "c_id")
    )
    if bulk:
        probe_pairs = probes.localCheckpoint(eager=True)
        probed_lists = sorted(
            r["c_id"]
            for r in probe_pairs.select("c_id").distinct().collect()
        )
    else:
        probe_rows = [(r["q_id"], r["c_id"]) for r in probes.collect()]
        probed_lists = sorted({c for _q, c in probe_rows})
        probe_pairs = unitv.sparkSession.createDataFrame(
            probe_rows, "q_id long, c_id long"
        )

    lut = _query_lut(qunit, cb, rounder)
    pruned = codes.filter(F.col("c_id").isin(probed_lists))
    if candidate_ids is not None:
        # Metadata PRE-filter: restrict candidate codes to the allowed
        # corpus ids BEFORE the shortlist, so the top-``shortlist`` (and
        # hence top-k) is computed WITHIN the filter — post-filtering a
        # generic shortlist would return < k whenever matches are rare
        # (the ann_filtered_topk rationale).  IVF's own caveat stands:
        # probed lists holding < k matching vectors bound the answer.
        pruned = pruned.join(
            F.broadcast(candidate_ids.select("vec_id")), "vec_id",
            "left_semi",
        )
    short = _ivf_adc_shortlist(
        pruned, probe_pairs, lut, rounder, shortlist,
        exclude_self=False, broadcast_queries=not bulk,
    )
    return _exact_rerank(
        short, unitv, qunit, rounder, k, broadcast_queries=not bulk
    )


#: Bridge chain-manifest filename (owned here so the GC can read
#: manifests without importing streaming code; streaming/assimilate.py
#: imports it as the one name both sides share).
CHAIN_MANIFEST = "_chain.json"

#: Registry subdir under the index root: one small file per bridge
#: output dir that holds a chain manifest.  The GC consults it — see
#: :func:`chain_protected_dirs`.
_CHAINS_REGISTRY = "_chains"


def register_chain_manifest(out_dir: str) -> None:
    """Record that ``out_dir`` carries a live bridge chain manifest so
    :func:`gc_pq_indexes` spares every generation the chain references
    (r16 VERDICT #1: a bridge's daily job only TOUCHES the head and its
    immediate base, so on a chain older than the GC window the sweep
    removed mid-chain generations and bricked the manifest into a full
    rebuild).  Called on every manifest save — the entry's mtime doubles
    as the registration's liveness stamp, letting the GC prune entries
    whose out_dir (or manifest) is long gone."""
    reg = os.path.join(_index_root(), _CHAINS_REGISTRY)
    os.makedirs(reg, exist_ok=True)
    key = hashlib.md5(os.path.abspath(out_dir).encode()).hexdigest()[:16]
    tmp = os.path.join(reg, f".{key}.tmp.{os.getpid()}")
    with open(tmp, "w") as fh:
        fh.write(os.path.abspath(out_dir))
    os.replace(tmp, os.path.join(reg, key))


def chain_protected_dirs() -> set[str]:
    """Every index directory referenced by a registered chain manifest
    (base + all generation-producing events): these are live no matter
    their age — a chain is read head-first, but a replayed early day
    probes an EARLY generation, so the whole chain must survive.

    FAILS CLOSED (r17 ADVICE): only a genuinely-absent entry or
    manifest (``FileNotFoundError`` — the chain was pruned or its
    out_dir deleted) is skipped.  Any other read error (permission
    blip, transient I/O, torn JSON — the manifest is saved atomically,
    so a decode error means real corruption) raises instead of
    silently dropping that chain's protection: the caller is the age
    sweep, and sweeping without full protection knowledge would
    irreversibly delete live mid-chain generations — the exact loss
    this registry exists to prevent."""
    import json

    reg = os.path.join(_index_root(), _CHAINS_REGISTRY)
    protected: set[str] = set()
    if not os.path.isdir(reg):
        return protected
    for name in os.listdir(reg):
        try:
            with open(os.path.join(reg, name)) as fh:
                out_dir = fh.read().strip()
            with open(os.path.join(out_dir, CHAIN_MANIFEST)) as fh:
                state = json.load(fh)
        except FileNotFoundError:
            continue  # chain genuinely gone: nothing to protect
        except (OSError, ValueError) as exc:
            raise RuntimeError(
                f"cannot resolve chain protection for registry entry "
                f"{name!r} ({exc}) — refusing to run an age sweep with "
                "incomplete protection knowledge; retry once the read "
                "succeeds, or remove the entry if the chain is dead"
            ) from exc
        protected.add(os.path.abspath(state["base"]))
        for e in state.get("events", []):
            if e.get("grown"):
                protected.add(os.path.abspath(e["grown"]))
    return protected


def gc_pq_indexes(max_age_s: float = 7 * 24 * 3600) -> list[str]:
    """Sweep the index root: abandoned staging dirs and superseded indexes.

    Two garbage classes accumulate under the shared index root (same
    age-based sweep discipline as the lake's ``gc_staging`` /
    ``gc_commit_markers``, maintenance.py):

    * ``*.build-*`` staging dirs whose builder died before commit AND
      before its own cleanup (SIGKILL) — uncommitted, so readers never
      see them, but they hold partial parquet.  Swept by age.
    * committed index dirs whose source table was regenerated or whose
      build version/parameters changed — the new fingerprint means
      nothing will ever read them again.  Unreferencable staleness is
      invisible to correctness, so the only safe eviction signal is age:
      an index untouched for ``max_age_s`` is swept.

    Age uses the directory mtime as a LAST-USE stamp: parquet reads don't
    bump it, so ``ensure_*`` / ``_load_index`` touch the dir on every use —
    an actively-queried index never ages out; a freshly built or rebuilt
    index always survives.

    CHAIN-AWARE (r16 VERDICT #1): any directory referenced by a
    registered bridge chain manifest (:func:`chain_protected_dirs`) is
    spared regardless of age — daily bridge use only touches the chain
    head, so mid-chain generations LOOK idle while the manifest still
    needs them for replay.  Releasing them is an explicit operator act:
    :func:`~mycenae_spark.streaming.assimilate.rebase_bridge_chain`
    drops them from the manifest, after which age reclaims them here.
    Stale registry entries (out_dir or manifest deleted) are pruned by
    the same age rule.  Returns the paths removed.
    """
    import time

    root = _index_root()
    if not os.path.isdir(root):
        return []
    protected = chain_protected_dirs()
    removed = []
    now = time.time()
    for name in os.listdir(root):
        path = os.path.join(root, name)
        if not os.path.isdir(path) or name == _CHAINS_REGISTRY:
            continue
        if os.path.abspath(path) in protected:
            continue
        try:
            age = now - os.path.getmtime(path)
        except OSError:
            continue  # concurrently removed
        if age < max_age_s:
            continue
        if ".build-" not in name and not index_is_committed(path):
            # torn external state inside the root: leave for a human —
            # ensure_* already refuses to read or replace it silently.
            continue
        shutil.rmtree(path, ignore_errors=True)
        removed.append(path)
    reg = os.path.join(root, _CHAINS_REGISTRY)
    if os.path.isdir(reg):
        for name in os.listdir(reg):
            entry = os.path.join(reg, name)
            try:
                with open(entry) as fh:
                    out_dir = fh.read().strip()
                live = os.path.isfile(os.path.join(out_dir, CHAIN_MANIFEST))
                stale = (
                    not live
                    and now - os.path.getmtime(entry) > max_age_s
                )
            except OSError:
                continue
            if stale:
                try:
                    os.unlink(entry)
                except OSError:
                    pass
    return removed
