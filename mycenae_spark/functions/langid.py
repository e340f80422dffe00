"""Materialized language-ID profile artifact (r11 VERDICT item 3).

The trained-profile lang-id family (``text_langid_trigram`` /
``text_langid_mixture``) re-trains its Cavnar–Trenkle-style per-language
n-gram profiles from the corpus ON EVERY QUERY — the standing first-run
hot spot (mixture 5.35 s driver / trigram 5.07 s at sf0.1).  In
production the profile is a once-per-corpus training job and queries are
pure SEARCH; this module materializes that split:

* ``ensure_langid_profiles`` — featurize once, write ``prof`` (ord,
  plang, gram, pf) + ``pnorm`` (ord, plang, pn) + (v2, r14) the
  per-DOCUMENT features ``dtf`` (doc_id, lang, ord, gram, tf) and
  ``dnorm`` (doc_id, ord, dn) as parquet behind the atomic
  CAS-by-rename + marker protocol shared with the ANN index lake
  (functions/pq.py) and the minhash band index (functions/dedup.py):
  readers only ever see a fully-committed artifact, concurrent builders
  race safely, and the fingerprint covers corpus file identity
  (path/size/mtime) + build version + the order set, so a regenerated
  corpus or a parameter change mints a NEW artifact instead of silently
  serving stale profiles.
* ``load_langid_profiles`` — marker-checked read; refuses torn builds.
* ``langid_confusion_indexed`` — the search phase: score the
  MATERIALIZED document features against the LOADED profiles.  v2
  removes the query-time gram explosion entirely (the r12/r13 VERDICT
  perf-floor carry): scoring is a columnar ``dtf`` scan → broadcast
  profile join → one (doc, lang, ord, plang) hash agg of tf·pf (exact
  integers) → broadcast norm joins → argmax.  The text column is never
  read at query time.

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

from mycenae_spark.sources.tables import explode_ne

LANGID_INDEX_VERSION = 2

#: Artifact tables, in commit order.  v2 (r14, the VERDICT r12/r13 carry):
#: the artifact also materializes the PER-DOCUMENT gram term frequencies
#: (``dtf``) and document norms (``dnorm``) beside the language profiles,
#: so the search phase never explodes the corpus at query time — scoring
#: is a columnar ``dtf`` scan + broadcast profile join + one hash agg.
_TABLES = ("prof", "pnorm", "dtf", "dnorm")


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
            explode_ne(  # length >= ord filtered above → non-empty
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
        # v2: the document-side features are a corpus property too —
        # materialize per-doc gram tf (the featurization a production
        # pipeline runs once per corpus) and the per-(doc, ord) norms,
        # so queries never re-explode the text column.
        dtf = g.groupBy("doc_id", "lang", "ord", "gram").agg(
            F.count(F.lit(1)).alias("tf")
        )
        dnorm = dtf.groupBy("doc_id", "ord").agg(
            F.sqrt(F.sum(F.col("tf") * F.col("tf"))).alias("dn")
        )
        prof.write.parquet(os.path.join(staging, "prof"))
        pnorm.write.parquet(os.path.join(staging, "pnorm"))
        dtf.write.parquet(os.path.join(staging, "dtf"))
        dnorm.write.parquet(os.path.join(staging, "dnorm"))
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
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Marker-checked read of a committed artifact → (prof, pnorm, dtf,
    dnorm).  Validates the probe's order set against the params persisted
    in the artifact (a mismatch would silently score the wrong profile
    family)."""
    from mycenae_spark.functions.pq import _load_index

    prof, pnorm, dtf, dnorm = _load_index(spark, index_dir, _TABLES)
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
    return prof, pnorm, dtf, dnorm


def langid_confusion_indexed(
    spark: SparkSession, sf_dir: str, orders: tuple[int, ...] = (3,)
) -> DataFrame:
    """SEARCH-phase lang-id confusion matrix against the materialized
    profiles — semantically identical to ``langid_mixture_confusion``
    over the same order set (one shared oracle proves it), minus the
    per-query training cost.

    Plan (artifact v2, r14 — the r12/r13 VERDICT carry, closed): the
    query-time gram EXPLOSION is gone.  The artifact materializes the
    per-document gram tf frame (``dtf``) and document norms (``dnorm``)
    beside the profiles, so scoring is: columnar ``dtf`` scan →
    broadcast profile join → ONE (doc, lang, ord, plang) hash agg of
    tf·pf (exact integers) → broadcast norm joins → argmax window →
    confusion agg.  The text column is never read and no per-query
    explode or tf aggregation runs at all.

    History: v1 scored against the live explosion (the profiles were
    the only materialized half) and floored at ~4.1–4.4 s driver at
    sf0.1; an in-row Σtf² rewrite of the norm branch was
    measured-and-rejected in r12 (~10% slower — interpreted fold beat
    by the hash agg it saved).  Featurizing the corpus ONCE is the
    production answer: at 100 TB the explosion is a once-per-corpus
    job priced with the build (bench extras, cache-hit flag), and the
    query cost follows |dtf| — the distinct (doc, gram) grain, smaller
    than raw instances and columnar-pruned to the probe's orders."""
    orders = tuple(sorted(orders))
    idx = ensure_langid_profiles(spark, sf_dir, orders)
    prof, pnorm, dtf, dnorm = load_langid_profiles(spark, idx, orders)
    # dot product at materialized tf grain: Σ_gram tf·pf — integer on
    # both engines, identical to Σ_instances pf (the v1 oracle form)
    dots = (
        dtf.join(F.broadcast(prof), ["ord", "gram"])
        .groupBy("doc_id", "lang", "ord", "plang")
        .agg(F.sum(F.col("tf") * F.col("pf")).alias("dot"))
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
