"""Deterministic sampling / splitting / decontamination for training-data
pipelines.

Production pipelines at 100 TB never use ``rand()`` for train/val/test
assignment: it is non-deterministic across task retries, engines, and
re-runs, and a document's split would change whenever the corpus changes.
The reproducible form is a **hash split**: bucket = md5(salt|id), compared
against cumulative hex thresholds.  That is a pure projection — no shuffle,
no global sort, stable under corpus growth (adding documents never moves an
existing document's split), and bit-identical in any engine with md5 (the
repo's cross-engine hash convention, registry/llm_queries.py module doc).

Benchmark decontamination is the other first-class op here: evaluation sets
are tiny (10³–10⁵ docs) next to a 100 TB corpus, so the eval n-gram set is
built once and BROADCAST against the corpus postings — a map-side join that
touches each corpus document once and never shuffles it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

from mycenae_spark.functions.text import shingles, tokens
from mycenae_spark.sources.tables import explode_ne


def hex_threshold(frac: float) -> str:
    """Cumulative split bound as a 4-hex-digit string (1/65536 granularity)."""
    return format(int(frac * 0x10000), "04x")


def split_bucket(id_col: Column | str, salt: str) -> Column:
    """The 4-hex-char md5 bucket a row's id falls in (uniform on [0, ffff])."""
    id_col = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(
        F.md5(F.concat(F.lit(f"{salt}|"), id_col.cast("string"))), 1, 4
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    salt: str = "split1",
    train: float = 0.90,
    val: float = 0.05,
    out: str = "split",
) -> DataFrame:
    """Assign each row a deterministic train/val/test split label.

    Requires ``train + val < 1`` (test takes the remainder): the bucket
    comparison is lexicographic on 4 hex chars, and a cumulative bound of
    1.0 would format as the 5-char ``"10000"``, which sorts BELOW ``"2…"``
    –``"f…"`` buckets and would silently mislabel them.  A two-way split
    is spelled ``val=0`` (val bucket empty), not ``train + val = 1``.
    """
    return df.withColumn(
        out, split_label(id_col, salt=salt, train=train, val=val)
    )


def split_label(
    id_col: Column | str,
    salt: str = "split1",
    train: float = 0.90,
    val: float = 0.05,
) -> Column:
    """The split label as a pure COLUMN expression — usable anywhere a
    row carries the id (e.g. labeling the two sides of a dedup pair
    without any join; the split being a pure function of the id is the
    entire point of hash splitting).  Same thresholds/validation as
    :func:`hash_split`, which is now a thin wrapper."""
    if not (0.0 < train and 0.0 <= val and train + val < 1.0):
        raise ValueError(
            f"need 0 < train and 0 <= val and train + val < 1, "
            f"got train={train} val={val}"
        )
    h4 = split_bucket(id_col, salt)
    return (
        F.when(h4 < F.lit(hex_threshold(train)), "train")
        .when(h4 < F.lit(hex_threshold(train + val)), "val")
        .otherwise("test")
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    value_col: str,
    k: int = 5,
    n_strata: int = 10,
    salt: str = "strat1",
    rank_shards: int = 32,
) -> DataFrame:
    """Exact k-per-stratum sample over rank-based strata (ntile semantics,
    ordered by ``(value_col, id_col)``) with **no corpus-sized global
    window** — the 100 TB form of "5 documents per length decile".

    A naive ``ntile(n)`` needs a global sort through one task.  The same
    assignment decomposes exactly:

    1. **Value histogram** — one hash aggregation ``groupBy(value_col)``;
       the result is bounded by the distinct-value domain (document
       lengths), not the corpus, and is collected driver-side exactly like
       ``approxQuantile``'s summary would be — except the histogram makes
       the boundaries *exact*, so the result is bit-identical to a global
       ntile and stays oracle-checkable with zero tolerance.
    2. **Global rank without a global sort** — each row's rank =
       (rows with smaller value, from the broadcast histogram's running
       offsets) + (row_number within its own value group, a window
       partitioned by ``value_col``).  Only ties on the stratification
       value rank against each other; nothing single-partitions.
    3. **ntile arithmetic** — with N known, the bucket of rank rn is a
       closed-form expression (first ``N % n`` buckets get one extra row).
    4. **Partial top-k** — per-stratum selection by md5 order runs as a
       two-phase top-k: k per (stratum, id-hash shard), then k over the
       ≤ ``n_strata·rank_shards·k`` survivors.  Both windows are
       partitioned; the final one sees a few hundred rows.

    Skew note: step 2's per-value window serializes rows sharing one exact
    value.  If one value dominated the corpus, rank-based strata are the
    wrong tool anyway — switch to value-based boundaries (step 1 alone,
    no rank) and drop the tie-splitting requirement.

    Returns ``(stratum, id_col, value_col, rn)`` with rn ∈ [1, k] ordered
    by the salted hash within each stratum.
    """
    hist = sorted(
        df.groupBy(value_col).agg(F.count(F.lit(1)).alias("_n")).collect(),
        key=lambda r: r[value_col],
    )
    n_rows = sum(r["_n"] for r in hist)
    if n_rows == 0:
        return df.select(
            F.lit(0).alias("stratum"),
            id_col,
            value_col,
            F.lit(0).alias("rn"),
        ).limit(0)
    offsets, acc = [], 0
    for r in hist:
        offsets.append((r[value_col], acc))
        acc += r["_n"]
    off_df = df.sparkSession.createDataFrame(offsets, [value_col, "_cum_before"])

    w_val = Window.partitionBy(value_col).orderBy(id_col)
    rn_global = F.col("_cum_before") + F.row_number().over(w_val)
    ranked = df.join(F.broadcast(off_df), value_col).withColumn("_rng", rn_global)

    q, rem = divmod(n_rows, n_strata)
    if q == 0:
        stratum = F.col("_rng")
    else:
        head = rem * (q + 1)
        stratum = F.when(
            F.col("_rng") <= F.lit(head),
            F.floor((F.col("_rng") - 1) / F.lit(q + 1)) + 1,
        ).otherwise(F.lit(rem) + F.floor((F.col("_rng") - 1 - head) / F.lit(q)) + 1)

    h = F.md5(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string")))
    tagged = ranked.select(
        stratum.cast("int").alias("stratum"),
        id_col,
        value_col,
        h.alias("_h"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(rank_shards)).alias("_shard"),
    )
    w_part = Window.partitionBy("stratum", "_shard").orderBy("_h", id_col)
    cand = (
        tagged.withColumn("_prn", F.row_number().over(w_part))
        .filter(F.col("_prn") <= k)
    )
    w_fin = Window.partitionBy("stratum").orderBy("_h", id_col)
    return (
        cand.withColumn("rn", F.row_number().over(w_fin))
        .filter(F.col("rn") <= k)
        .select("stratum", id_col, value_col, "rn")
    )


def distinct_grams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """``(id_col, grams)`` — each document's distinct word-n-gram set as an
    array (the per-document form; tests cross-check it against
    ``gram_postings``, the full-corpus form)."""
    return (
        df.select(id_col, tokens(text_col).alias("_toks"))
        .filter(F.size("_toks") >= n)
        .select(id_col, F.array_distinct(shingles(F.col("_toks"), n)).alias("grams"))
    )


def gram_postings(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """``(id_col, gram)`` — DISTINCT word-n-gram postings, exploded form.

    Built with ``posexplode`` + ``lead`` windows so every string operation
    stays inside whole-stage codegen; the per-row higher-order
    ``transform`` that builds shingle *arrays* evaluates interpreted and
    measured 2× slower over a full corpus (fine for the bounded dedup
    queries, wrong for corpus-sized scans).  Output is identical to
    exploding ``distinct_grams`` (asserted in tests/test_sampling_units).
    The window partitions by document — the shuffle moves (doc, pos, tok)
    triples once and each document's grams build independently."""
    tk = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "tok")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    parts = ["tok"] + [F.lead("tok", i).over(w) for i in range(1, n)]
    last = F.lead("tok", n - 1).over(w) if n > 1 else F.col("tok")
    return (
        tk.select(
            id_col,
            F.concat_ws(" ", *parts).alias("gram"),
            last.alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .select(id_col, "gram")
        .distinct()
    )


def contamination_pairs(
    train: DataFrame,
    eval_: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """(train_doc, eval_doc, n_shared) for every train/eval pair sharing at
    least one distinct word-n-gram.

    The eval side (shingled, exploded) is broadcast — benchmark sets are
    small by construction — so the corpus-side postings never shuffle: the
    contamination scan is one map-side hash join + a hash aggregation keyed
    on (train_doc, eval_doc), a key space bounded by actual overlaps, not
    the cross product."""
    tg = gram_postings(train, id_col, text_col, n).select(
        F.col(id_col).alias("train_doc"), "gram"
    )
    eg = gram_postings(eval_, id_col, text_col, n).select(
        F.col(id_col).alias("eval_doc"), "gram"
    )
    return (
        tg.join(F.broadcast(eg), "gram")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def dsir_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: Column,
    *,
    n_buckets: int = 10_000,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv 2302.03169) as a
    generic kernel: score each document by how much likelier its
    hashed-bigram features are under the TARGET slice (``target_pred``,
    any boolean Column — a language, a domain tag, a quality flag) than
    under the raw corpus.  ``n_buckets`` is the feature-hash width; the
    paper's grain is 10k.

    Feature map: word bigram → first 4 md5 hex chars → int mod
    ``n_buckets`` (the repo's cross-engine hash convention; DuckDB
    mirrors it exactly, so judged oracles hash-match).  Bucket
    distributions use add-1 smoothing over ``n_buckets``; the per-bucket
    log-ratio quantizes ONCE to integer ten-thousandths
    (floor(ln·1e4 + 0.5 + 1e-6)) so each document's weight is an exact
    BIGINT dot product — no float sum whose addition order could differ
    between engines or between partitionings.

    Returns (id, *extra_cols, n_bigrams, weight_u) — callers rank/cut.

    Scale: ONE corpus scan into the (doc, feat) aggregate; src/tgt are
    ``n_buckets``-row re-aggregates; the log-ratio table broadcasts back
    onto the doc-feature frame.  Nothing downstream of the first
    aggregate carries corpus volume."""
    from mycenae_spark.functions.text import shingles, tokens

    toked = df.select(
        id_col, *extra_cols, tokens(text_col).alias("_ts"),
        target_pred.alias("_is_tgt"),
    ).filter(F.size("_ts") >= 2)
    nb = float(n_buckets)
    bi = toked.select(
        id_col,
        *extra_cols,
        "_is_tgt",
        explode_ne(shingles("_ts", 2)).alias("_g"),  # size >= 2 filtered
    ).select(
        id_col,
        *extra_cols,
        "_is_tgt",
        F.pmod(
            F.conv(F.substring(F.md5("_g"), 1, 4), 16, 10).cast("long"),
            F.lit(n_buckets),
        ).alias("feat"),
    )
    # docf feeds FIVE consumers (src, tgt, both totals via their
    # re-aggregates, the final weight join) — a lazy localCheckpoint
    # materializes the corpus scan + bigram explode + aggregate once
    # instead of per consumer (the one-copy contract _gram_postings
    # uses; measured at sf0.1/32: dsir10k 2.2 → 1.1 s min-of-4 warm).
    docf = bi.groupBy(id_col, *extra_cols, "_is_tgt", "feat").agg(
        F.count(F.lit(1)).alias("c")
    ).localCheckpoint(eager=False)
    src = docf.groupBy("feat").agg(F.sum("c").alias("sc"))
    tgt = (
        docf.filter(F.col("_is_tgt"))
        .groupBy("feat")
        .agg(F.sum("c").alias("tc"))
    )
    tots = src.agg(F.sum("sc").cast("double").alias("s_tot")).crossJoin(
        tgt.agg(
            F.coalesce(F.sum("tc"), F.lit(0)).cast("double").alias("t_tot")
        )
    )
    lr_expr = F.floor(
        F.log(
            (F.coalesce(F.col("tc"), F.lit(0)) + 1.0)
            * (F.col("s_tot") + nb)
            / ((F.col("sc") + 1.0) * (F.col("t_tot") + nb))
        )
        * 10000
        + 0.5
        + 1e-6
    ).cast("long")
    lr = (
        src.join(tgt, "feat", "left")
        .crossJoin(F.broadcast(tots))
        .select("feat", lr_expr.alias("lr_u"))
    )
    return (
        docf.join(F.broadcast(lr), "feat")
        .groupBy(id_col, *extra_cols)
        .agg(
            F.sum(F.col("c") * F.col("lr_u")).alias("weight_u"),
            F.sum("c").alias("n_bigrams"),
        )
    )
