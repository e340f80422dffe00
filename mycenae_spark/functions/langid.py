"""Materialized language-ID profile artifact (r11 VERDICT item 3).

The trained-profile lang-id family (``text_langid_trigram`` /
``text_langid_mixture``) re-trains its Cavnar–Trenkle-style per-language
n-gram profiles from the corpus ON EVERY QUERY — the standing first-run
hot spot (mixture 5.35 s driver / trigram 5.07 s at sf0.1).  In
production the profile is a once-per-corpus training job and queries are
pure SEARCH; this module materializes that split:

* ``ensure_langid_profiles`` — train once, write ``prof`` (ord, plang,
  gram, pf) + ``pnorm`` (ord, plang, pn) as parquet behind the atomic
  CAS-by-rename + marker protocol shared with the ANN index lake
  (functions/pq.py) and the minhash band index (functions/dedup.py):
  readers only ever see a fully-committed artifact, concurrent builders
  race safely, and the fingerprint covers corpus file identity
  (path/size/mtime) + build version + the order set, so a regenerated
  corpus or a parameter change mints a NEW artifact instead of silently
  serving stale profiles.
* ``load_langid_profiles`` — marker-checked read; refuses torn builds.
* ``langid_confusion_indexed`` — the search phase: score documents
  against the LOADED profiles.  Two structural wins over the inline
  form: the profile/norm training aggregations disappear from the
  query, and the profile frame (#langs × gram vocab — broadcastable by
  construction) joins BROADCAST, so the dot product needs no gram-keyed
  shuffle at all.  The dot product itself runs at raw gram-instance
  grain (Σ_instances pf ≡ Σ_g tf·pf — both exact integer sums), which
  drops the (doc, gram) tf aggregation from the dot branch; only the
  document-norm branch still needs it.

Parameter agreement between artifact and probe is validated against a
``_params.json`` persisted IN the artifact (the band-index r11 review
convention): a probe compiled with a different order set raises instead
of silently scoring against the wrong profile family.

At 100 TB: training cost follows the corpus (once), search cost follows
the query batch; the profile artifact is KB–MB scale per language and
broadcasts, so scoring is scan + one (doc, lang, plang) hash agg.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

LANGID_INDEX_VERSION = 1

#: Artifact tables, in commit order.
_TABLES = ("prof", "pnorm")


def langid_index_fingerprint(sf_dir: str, orders: tuple[int, ...]) -> str:
    """Stat-based content fingerprint (the shared ``pq.fingerprint_tree``
    walk: file identity, never a data read) of the documents table +
    build version + order set."""
    from mycenae_spark.functions.pq import fingerprint_tree

    src = os.path.join(sf_dir.rstrip("/"), "documents.parquet")
    h = hashlib.md5(
        f"langid-v{LANGID_INDEX_VERSION}|orders{','.join(map(str, orders))}"
        f"|{os.path.abspath(src)}".encode()
    )
    fingerprint_tree(h, src)
    return h.hexdigest()[:16]


def langid_index_dir(sf_dir: str, orders: tuple[int, ...]) -> str:
    from mycenae_spark.functions.pq import _index_root

    return os.path.join(
        _index_root(), f"langid-{langid_index_fingerprint(sf_dir, orders)}"
    )


def _grams(d: DataFrame, spark: SparkSession, orders: tuple[int, ...]):
    """Per-(doc, ord) gram instances — the exact explosion the inline
    mixture kernel uses (length guard on both engines: Spark's
    sequence() counts DOWN below the floor)."""
    orders_df = spark.createDataFrame([(o,) for o in orders], "ord int")
    return (
        d.crossJoin(F.broadcast(orders_df))
        .filter(F.length("text") >= F.col("ord"))
        .select(
            "doc_id",
            "lang",
            "ord",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("text") - F.col("ord") + 1),
                    lambda i: F.col("text").substr(i, F.col("ord")),
                )
            ).alias("gram"),
        )
    )


def ensure_langid_profiles(
    spark: SparkSession, sf_dir: str, orders: tuple[int, ...] = (3,)
) -> str:
    """Train-and-commit the profile artifact for ``sf_dir`` if absent;
    return its directory.  Idempotent; concurrent builders race on the
    atomic rename and the loser adopts the winner's (deterministically
    equal) artifact."""
    from mycenae_spark.functions.pq import (
        _commit_index,
        _index_root,
        _touch_index,
        index_is_committed,
    )
    from mycenae_spark.sources.tables import load_table

    orders = tuple(sorted(orders))
    dest = langid_index_dir(sf_dir, orders)
    if index_is_committed(dest):
        _touch_index(dest)
        return dest
    os.makedirs(_index_root(), exist_ok=True)
    staging = f"{dest}.build-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    try:
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "text"
        )
        g = _grams(d, spark, orders)
        # profile term frequencies: integer Σ over the language's corpus
        # slice (counting raw instances ≡ Σ per-doc tf — same integers)
        prof = g.groupBy(
            F.col("lang").alias("plang"), "ord", "gram"
        ).agg(F.count(F.lit(1)).alias("pf"))
        pnorm = prof.groupBy("plang", "ord").agg(
            F.sqrt(F.sum(F.col("pf") * F.col("pf"))).alias("pn")
        )
        prof.write.parquet(os.path.join(staging, "prof"))
        pnorm.write.parquet(os.path.join(staging, "pnorm"))
        with open(os.path.join(staging, "_params.json"), "w") as fh:
            json.dump(
                {"version": LANGID_INDEX_VERSION, "orders": list(orders)}, fh
            )
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    return _commit_index(
        dest, staging, langid_index_fingerprint(sf_dir, orders)
    )


def load_langid_profiles(
    spark: SparkSession, index_dir: str, orders: tuple[int, ...]
) -> tuple[DataFrame, DataFrame]:
    """Marker-checked read of a committed artifact → (prof, pnorm).
    Validates the probe's order set against the params persisted in the
    artifact (a mismatch would silently score the wrong profile family)."""
    from mycenae_spark.functions.pq import _load_index

    prof, pnorm = _load_index(spark, index_dir, _TABLES)
    try:
        with open(os.path.join(index_dir, "_params.json")) as fh:
            params = json.load(fh)
    except FileNotFoundError:
        params = None
    if params is not None:
        want = {
            "version": LANGID_INDEX_VERSION,
            "orders": list(sorted(orders)),
        }
        have = {k: params.get(k) for k in want}
        if have != want:
            raise ValueError(
                f"langid artifact at {index_dir!r} was built with {have}, "
                f"probe compiled with {want} — rebuild via "
                "ensure_langid_profiles or pass matching orders"
            )
    return prof, pnorm


def langid_confusion_indexed(
    spark: SparkSession, sf_dir: str, orders: tuple[int, ...] = (3,)
) -> DataFrame:
    """SEARCH-phase lang-id confusion matrix against the materialized
    profiles — semantically identical to ``langid_mixture_confusion``
    over the same order set (one shared oracle proves it), minus the
    per-query training cost.

    Plan: gram explosion → (a) dot products at raw instance grain
    against the BROADCAST profile (no gram shuffle, exact integer sums)
    and (b) the (doc, ord) norm branch (needs per-gram tf, one keyed
    agg) → join + argmax window → confusion agg.

    Measured-and-rejected (r12): replacing branch (b)'s gram-keyed agg
    with an IN-ROW Σtf² (array_sort + run-length fold per document —
    the text_repetition zero-shuffle trick) produced identical values
    but ran ~10% SLOWER at sf0.1: the interpreted higher-order fold
    over ~500-element arrays costs more than the hash-agg exchange it
    saves.  The remaining search cost is doc-side by nature (the
    corpus must be exploded and normed per query batch); the artifact's
    win is the REMOVED training aggregations, worth ~1 s of the inline
    form's 5.4 s first-run at sf0.1 and proportionally more as #langs
    × vocab grows."""
    from mycenae_spark.sources.tables import load_table

    orders = tuple(sorted(orders))
    idx = ensure_langid_profiles(spark, sf_dir, orders)
    prof, pnorm = load_langid_profiles(spark, idx, orders)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    g = _grams(d, spark, orders)
    # dot product, raw-instance grain: Σ_instances pf(gram) is EXACTLY
    # Σ_gram tf·pf — integer on both engines — so the tf aggregation is
    # skipped on this branch entirely
    dots = (
        g.join(F.broadcast(prof), ["ord", "gram"])
        .groupBy("doc_id", "lang", "ord", "plang")
        .agg(F.sum("pf").alias("dot"))
    )
    dg = g.groupBy("doc_id", "lang", "ord", "gram").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dnorm = dg.groupBy("doc_id", "ord").agg(
        F.sqrt(F.sum(F.col("tf") * F.col("tf"))).alias("dn")
    )
    from mycenae_spark.registry.util import r6

    per_ord = (
        dots.join(dnorm, ["doc_id", "ord"])
        .join(F.broadcast(pnorm), ["plang", "ord"])
        .select(
            "doc_id", "lang", "plang",
            (F.col("dot") / (F.col("dn") * F.col("pn"))).alias("cos"),
        )
    )
    mixed = per_ord.groupBy("doc_id", "lang", "plang").agg(
        r6(F.sum("cos") / F.lit(float(len(orders)))).alias("mix_r")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("mix_r"), "plang")
    best = mixed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return best.groupBy("lang", F.col("plang").alias("pred")).agg(
        F.count(F.lit(1)).alias("n")
    )
