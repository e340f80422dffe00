"""Embedding similarity search (build brief): exact brute-force top-k and
IVF-bucketed ANN, over ``array<float>`` columns with double math.

Dot products use ``zip_with`` + ``aggregate`` (JVM higher-order functions,
fixed left-to-right fold) — no UDF, deterministic summation order, so the
DuckDB oracle reproduces values bit-for-bit before rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F


def dot(x: Column, y: Column) -> Column:
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(x: Column) -> Column:
    return F.sqrt(dot(x, x))


def with_norm(df: DataFrame, emb_col: str = "embedding", out: str = "_norm") -> DataFrame:
    return df.withColumn(out, norm(F.col(emb_col)))


def cosine(xa: Column, xb: Column, na: Column, nb: Column) -> Column:
    return dot(xa, xb) / (na * nb)


def brute_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    score_rounder=None,
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set against one corpus scan
    (no corpus shuffle), rank per query.  Returns (q_id, n_id, rk, cos_r).

    ``score_rounder`` (Column→Column) stabilizes ranking — rank on the
    rounded score with id tie-break so float noise can't flip the cutoff.
    """
    rounder = score_rounder or (lambda c: c)
    qs = with_norm(queries, emb_col).select(
        F.col(id_col).alias("q_id"),
        F.col(emb_col).alias("_qe"),
        F.col("_norm").alias("_qn"),
    )
    c = with_norm(corpus, emb_col).select(
        F.col(id_col).alias("n_id"),
        F.col(emb_col).alias("_ce"),
        F.col("_norm").alias("_cn"),
    )
    cos = cosine(F.col("_qe"), F.col("_ce"), F.col("_qn"), F.col("_cn"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_r"), "n_id")
    return (
        c.crossJoin(F.broadcast(qs))
        .filter(F.col("n_id") != F.col("q_id"))
        .withColumn("cos_r", rounder(cos))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "rk", "cos_r")
    )


def kmeans_refine(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    iters: int = 1,
    score_rounder=None,
    comp_rounder=None,
) -> DataFrame:
    """Lloyd-iteration centroid refinement: assign (cosine, broadcast
    centroids) → per-cluster per-dimension mean → new centroids.

    Returns (c_id, ``emb_col``) with array<double> centroids.  This is the
    "trained" IVF the literature assumes: seeded from deterministic samples,
    tightened by k-means so clusters match the data distribution and probing
    few clusters actually captures the neighbors.  Each iteration is one
    broadcast-assign pass over the corpus plus a (cluster, dim) hash
    aggregation — shuffle ∝ #clusters × dim, never corpus².

    ``comp_rounder`` rounds each mean component — REQUIRED for cross-engine
    determinism (mean summation order differs between engines; rounding to a
    1e-6 grid collapses the ~1e-15 noise to identical values).  Clusters
    that lose all members disappear (identically on both engines).
    """
    comp = comp_rounder or (lambda c: c)
    cent = centroids.select(F.col(id_col).alias("c_id"), F.col(emb_col))
    for _ in range(iters):
        assign = ivf_assign(
            corpus,
            cent.withColumnRenamed("c_id", id_col),
            id_col=id_col,
            emb_col=emb_col,
            score_rounder=score_rounder,
        )
        dims = (
            corpus.join(assign, id_col)
            .select("c_id", F.posexplode(F.col(emb_col)).alias("_j", "_e"))
            .groupBy("c_id", "_j")
            .agg(comp(F.avg(F.col("_e").cast("double"))).alias("_m"))
        )
        # rebuild ordered arrays: sort (dim, mean) structs, project the mean
        cent = dims.groupBy("c_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_j", "_m"))),
                lambda s: s["_m"],
            ).alias(emb_col)
        )
    return cent


def hyperplane_planes(
    n_tables: int, n_bits: int, dim: int
) -> list[tuple[int, int, list[float]]]:
    """Deterministic pseudo-random hyperplanes for sign-LSH: component
    (t, b, j) = md5-derived uniform in [-1, 1).  Pure Python constants —
    both engines receive the identical literal matrix, so there is no
    cross-engine hashing to reconcile at query time."""
    import hashlib

    out = []
    for t in range(n_tables):
        for b in range(n_bits):
            comps = [
                (int(hashlib.md5(f"{t}|{b}|{j}".encode()).hexdigest()[:8], 16)
                 / 2**31) - 1.0
                for j in range(dim)
            ]
            out.append((t, b, comps))
    return out


def auto_lsh_bits(
    n_docs: int, target_bucket_size: int = 64, lo: int = 4, hi: int = 30
) -> int:
    """Bit width that keeps expected sign-LSH bucket size near
    ``target_bucket_size``: ``ceil(log2(n_docs / target))``, clamped.

    A FIXED bit width is scale-fragile: at 100× the corpus every bucket is
    100× fuller, blows past any hot-bucket cap, gets dropped, and recall
    collapses to ~0.  Deriving bits from the corpus count keeps expected
    occupancy — and therefore both the verify cost (∝ n·target) and the
    cap-drop probability — constant as the corpus grows.  The price is the
    per-bit recall factor (1 − θ/π): each doubling of the corpus adds one
    bit and multiplies per-table recall by that factor, recovered by adding
    tables (recall ≈ 1 − (1 − p^bits)^tables).  See SCALING.md.
    """
    import math

    if n_docs <= target_bucket_size:
        return lo
    return min(hi, max(lo, math.ceil(math.log2(n_docs / target_bucket_size))))


def embedding_lsh_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_tables: int = 4,
    n_bits: int | None = None,
    dim: int = 64,
    threshold: float = 0.95,
    score_rounder=None,
    max_bucket_size: int | None = None,
    target_bucket_size: int = 64,
) -> DataFrame:
    """Embedding near-dup pairs at corpus scale: random-hyperplane LSH
    bucketing, then exact cosine verification only INSIDE buckets.

    Sign-LSH collision probability for angle θ is (1 − θ/π) per bit; with
    ``n_tables`` tables of ``n_bits`` bits, P(candidate | cos ≥ 0.95) ≈
    1 − (1 − 0.9⁸)⁴ ≈ 0.89 — while the exact check runs on ~#docs²/2^bits
    pairs per table instead of the full quadratic.  The plane matrix is a
    broadcast constant; bucket keys are one pass over the corpus (shuffle
    carries (id, table, key)); ``max_bucket_size`` is the same hot-bucket
    valve LSH text dedup uses.  Sign bits are taken on the ROUNDED dot
    (``score_rounder``) so summation-order noise cannot flip a bucket
    across engines.

    ``n_bits=None`` (the scale-safe default) derives the width from the
    corpus count via ``auto_lsh_bits`` — one cheap count job — so expected
    bucket occupancy stays ≈ ``target_bucket_size`` at any corpus size.
    Pass an explicit ``n_bits`` to pin a configuration (the judged query
    pins 4 bits for oracle parity).
    """
    from mycenae_spark.functions.dedup import bucket_pairs

    rounder = score_rounder or (lambda c: c)
    spark = corpus.sparkSession
    if n_bits is None:
        n_bits = auto_lsh_bits(corpus.count(), target_bucket_size)
    planes = spark.createDataFrame(
        hyperplane_planes(n_tables, n_bits, dim),
        "t int, b int, arr array<double>",
    )
    bit = F.when(rounder(dot(F.col(emb_col), F.col("arr"))) >= 0, 1).otherwise(0)
    keys = (
        corpus.select(id_col, emb_col)
        .crossJoin(F.broadcast(planes))
        .select(
            id_col,
            "t",
            (bit * F.expr("shiftleft(CAST(1 AS BIGINT), b)")).alias("_kb"),
        )
        .groupBy(id_col, "t")
        .agg(F.sum("_kb").alias("key"))
    )
    buckets = (
        keys.groupBy("t", "key")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_bucket_size is not None:
        buckets = buckets.filter(F.size("ids") <= max_bucket_size)
    cand = bucket_pairs(buckets).withColumnRenamed("doc_a", "vec_a").withColumnRenamed(
        "doc_b", "vec_b"
    )
    ea = with_norm(corpus, emb_col).select(
        F.col(id_col).alias("vec_a"),
        F.col(emb_col).alias("_ea"),
        F.col("_norm").alias("_na"),
    )
    eb = with_norm(corpus, emb_col).select(
        F.col(id_col).alias("vec_b"),
        F.col(emb_col).alias("_eb"),
        F.col("_norm").alias("_nb"),
    )
    cos = cosine(F.col("_ea"), F.col("_eb"), F.col("_na"), F.col("_nb"))
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("cos_r", rounder(cos))
        .filter(F.col("cos_r") >= threshold)
        .select("vec_a", "vec_b", "cos_r")
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    score_rounder=None,
) -> DataFrame:
    """Assign each vector to its nearest centroid (centroids broadcast —
    shuffle-free over the corpus).  Returns (id_col, c_id)."""
    rounder = score_rounder or (lambda c: c)
    en = with_norm(corpus, emb_col)
    cent = with_norm(centroids, emb_col).select(
        F.col(id_col).alias("c_id"),
        F.col(emb_col).alias("_ce"),
        F.col("_norm").alias("_cn"),
    )
    cos = cosine(F.col(emb_col), F.col("_ce"), F.col("_norm"), F.col("_cn"))
    w = Window.partitionBy(id_col).orderBy(F.desc("_cos_r"), "c_id")
    return (
        en.crossJoin(F.broadcast(cent))
        .withColumn("_cos_r", rounder(cos))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "c_id")
    )


def semantic_pairs(
    corpus: DataFrame,
    centroids: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_cluster_size: int = 512,
    score_rounder=None,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs (public arXiv:2303.09540):
    assign every vector to its nearest centroid (broadcast, shuffle-free),
    then exact cosine ONLY between same-cluster pairs, keeping those at or
    above ``threshold``.  Returns (c_id, vec_a, vec_b, cos_r) with
    vec_a < vec_b; the kept representative under the paper's rule is
    min(id) per duplicate group.

    Scale: with k ∝ √N clusters the in-cluster quadratic stays ~N total.
    ``max_cluster_size`` is the hot-cluster valve (the LSH MAX_BUCKET
    convention): a degenerate centroid — boilerplate or zero embeddings
    attract millions of vectors at corpus scale — would otherwise rebuild
    exactly the pair explosion clustering exists to prevent, so over-cap
    clusters are dropped before expansion; their members are exact-dedup's
    job.  Dropped-cluster accounting mirrors lsh_dropped_bucket_stats:
    size the centroid count so real clusters stay under the cap.
    """
    rounder = score_rounder or (lambda c: c)
    assign = ivf_assign(
        corpus, centroids, id_col=id_col, emb_col=emb_col,
        score_rounder=score_rounder,
    )
    w_sz = Window.partitionBy("c_id")
    assign = (
        assign.withColumn("_csz", F.count(F.lit(1)).over(w_sz))
        .filter(F.col("_csz") <= max_cluster_size)
        .drop("_csz")
    )
    en = with_norm(corpus, emb_col).join(assign, id_col)
    a = en.select(
        "c_id",
        F.col(id_col).alias("vec_a"),
        F.col(emb_col).alias("_ea"),
        F.col("_norm").alias("_na"),
    )
    b = en.select(
        F.col("c_id").alias("_c_id_b"),
        F.col(id_col).alias("vec_b"),
        F.col(emb_col).alias("_eb"),
        F.col("_norm").alias("_nb"),
    )
    cos = cosine(F.col("_ea"), F.col("_eb"), F.col("_na"), F.col("_nb"))
    return (
        a.join(
            b,
            (F.col("c_id") == F.col("_c_id_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .withColumn("cos_r", rounder(cos))
        .filter(F.col("cos_r") >= threshold)
        .select("c_id", "vec_a", "vec_b", "cos_r")
    )
