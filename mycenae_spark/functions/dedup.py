"""Deduplication operators (build brief): exact, MinHash+LSH, SimHash,
n-gram Jaccard — each shaped so the shuffle never carries the corpus
quadratically (see SCALING.md §5).

Determinism contract: every hash is md5 (identical lowercase hex in Spark
and DuckDB); minhash takes *lexicographic string mins* of salted md5s — a
valid minwise family with no engine-specific integer hashing anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from mycenae_spark.functions.text import shingles, tokens


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per distinct text: keeper id (min) + copy count.
    At 100 TB group on md5(text) so the shuffle carries 16-byte keys."""
    return df.groupBy(text_col).agg(
        F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_bands: int = 4, ngram: int = 3
) -> DataFrame:
    """Per-document band signatures: sig_b = min(md5('b|' + shingle)).

    Short documents are filtered out *before* shingle construction so the
    unguarded (fast) n-gram builder applies — the `when`-guarded general
    ``shingles()`` measured ~10× slower here because the conditional is
    inlined into every band's expression after projection collapse.
    """
    toked = df.select(id_col, tokens(text_col).alias("_toks")).filter(
        F.size("_toks") >= ngram
    )
    idx = F.sequence(F.lit(1), F.size("_toks") - (ngram - 1))
    build = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at("_toks", i + off) for off in range(ngram)]
        ),
    )
    sh = toked.select(id_col, build.alias("_sh"))
    cols = [
        F.array_min(
            F.transform("_sh", lambda s: F.md5(F.concat(F.lit(f"{b}|"), s)))
        ).alias(f"sig{b}")
        for b in range(n_bands)
    ]
    return sh.select(id_col, *cols)


def lsh_candidate_pairs(sigs: DataFrame, id_col: str, n_bands: int = 4) -> DataFrame:
    """LSH bucket join in one pass: unpivot bands → groupBy (band, sig) →
    pair expansion *inside* collision buckets (tiny by construction).

    Never self-joins the signature pipeline (which Spark would recompute on
    both branches — measured 7× slower at sf0.1) and never shuffles more
    than #docs × #bands rows.
    """
    bands = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"sig{b}").alias("sig"))
                    for b in range(n_bands)
                ]
            )
        ).alias("bs"),
    ).select(id_col, "bs.band", "bs.sig")
    buckets = (
        bands.groupBy("band", "sig")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ids",
                    lambda a, i: F.transform(
                        F.slice("ids", i + F.lit(2), F.size("ids")),
                        lambda b: F.struct(a.alias("doc_a"), b.alias("doc_b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.doc_a", "p.doc_b").distinct()


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """Per-bit majority vote over token md5s → one integer signature.
    Two hash aggregations, zero pairwise work; near-dup clustering then
    operates on Hamming distance over 8-byte values."""
    tok = df.select(id_col, F.explode(tokens(text_col)).alias("_tok"))
    h = tok.select(
        id_col,
        F.conv(F.substring(F.md5("_tok"), 1, 8), 16, 10).cast("long").alias("_h"),
    )
    n = h.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    js = df.sparkSession.range(bits).select(F.col("id").cast("int").alias("_j"))
    bit = (F.floor(F.col("_h") / F.pow(F.lit(2.0), F.col("_j"))).cast("long") % 2)
    per_bit = (
        h.crossJoin(F.broadcast(js))
        .select(id_col, "_j", bit.alias("_bit"))
        .groupBy(id_col, "_j")
        .agg(F.sum("_bit").alias("_c"))
    )
    weight = F.pow(F.lit(2.0), F.col("_j")).cast("long")
    return (
        per_bit.join(n, id_col)
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(2 * F.col("_c") > F.col("_n"), weight).otherwise(F.lit(0))
            ).alias("simhash")
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 2,
    threshold: float = 0.05,
) -> DataFrame:
    """Pairwise n-gram-set Jaccard via an inverted index: postings join on
    the shingle, |A∪B| = |A|+|B|−common.  Cost ∝ postings lists; pairs only
    materialize for documents sharing ≥1 shingle."""
    g = df.select(
        id_col, F.array_distinct(shingles(tokens(text_col), ngram)).alias("_g")
    ).filter(F.size("_g") > 0)
    sizes = g.select(id_col, F.size("_g").alias("_sz"))
    inv = g.select(id_col, F.explode("_g").alias("_gram"))
    a = inv.select(F.col(id_col).alias("doc_a"), "_gram")
    b = inv.select(F.col(id_col).alias("doc_b"), "_gram")
    common = (
        a.join(b, "_gram")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("_sz").alias("_sa"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("_sz").alias("_sb"))
    jac = F.col("_c") / (F.col("_sa") + F.col("_sb") - F.col("_c"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", jac.alias("jaccard"))
    )


def connected_components(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b", max_iter: int = 20
) -> DataFrame:
    """Cluster near-dup candidate pairs into components: every member gets
    ``cluster_id`` = the smallest doc id reachable from it.

    Iterative min-label propagation (the scalable path for dedup clustering
    when the pair graph no longer fits one machine): each round joins labels
    across edges and keeps the min; converges in O(component diameter)
    rounds — LSH components are shallow, so this is a handful of shuffles.
    ``localCheckpoint`` cuts lineage growth per round.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
    )
    # localCheckpoint materializes `edges`/`labels` with fresh lineage, which
    # also sidesteps Spark's ambiguous-self-join detection across rounds.
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # 1) hook: pull the min label across direct edges
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
            .withColumnRenamed("src", "nnode")
        )
        hooked = labels.join(
            neighbor_min, labels.node == neighbor_min.nnode, "left"
        ).select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
            ).alias("label"),
        )
        # 2) pointer-jump: label ← label's label.  Without this the loop
        # needs O(component diameter) rounds (a 172-node LSH chain broke a
        # 20-round cap); with it, O(log diameter).
        ptr = hooked.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        new_labels = (
            hooked.join(ptr, hooked.label == ptr.pnode, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("plabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.withColumnRenamed("label", "new_label")
            .join(labels, "node")
            .filter(F.col("new_label") != F.col("label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
