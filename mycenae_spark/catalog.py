"""Series catalog — the Solr metadata index re-expressed (SURVEY.md §2.9).

Mycenae indexes one document per series (metric, tag keys/values) in Solr and
resolves every query's tag filters there before touching Cassandra; memcached
caches the resolution (upstream ``lib/metadata``, ``lib/memcached``).

Spark-native equivalent: a compacted, *tiny* DataFrame of distinct series
identities.  At 100 TB of points the catalog is still only #series rows, so
it caches in memory and broadcast-joins against the point lake — the same
asymmetry mycenae exploits.  ``suggest``/``lookup``/``meta`` become trivial
DataFrame expressions over it; the MaxTimeseries guard is a pre-flight count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def build_catalog(points: DataFrame, tag_cols: list[str] | None = None) -> DataFrame:
    """Distinct series identities from a points frame.

    Batch form; the streaming ingest keeps the same table incrementally
    current via per-batch MERGE (streaming/ingest.py).  The distinct is a
    partial-aggregated shuffle of only the identity columns (column pruning
    keeps the scan narrow).
    """
    tag_cols = tag_cols or [c for c in points.columns if c.startswith("tag_")]
    return points.select("metric", *tag_cols).distinct()


def suggest(
    catalog: DataFrame,
    kind: str,
    prefix: str,
    limit: int = 25,
    tagk: str | None = None,
) -> DataFrame:
    """M1 ``/api/suggest``: prefix-matched distinct names, capped.

    kind ∈ {metrics, tagk, tagv}.  ``tagv`` suggests over the values of ALL
    tag columns (or one specific tag via ``tagk=``) — no column is
    hardcoded, so any tag schema works.
    """
    if kind == "metrics":
        df, col = catalog, "metric"
    elif kind == "tagk":
        names = [c[4:] for c in catalog.columns if c.startswith("tag_")]
        df = catalog.sparkSession.createDataFrame([(n,) for n in names], ["tagk"])
        col = "tagk"
    elif kind == "tagv":
        tag_cols = (
            [f"tag_{tagk}"]
            if tagk is not None
            else [c for c in catalog.columns if c.startswith("tag_")]
        )
        missing = [c for c in tag_cols if c not in catalog.columns]
        if missing:
            raise KeyError(f"unknown tag column(s): {missing}")
        df = catalog.select(
            F.explode(
                F.array(*[F.col(c).cast("string") for c in tag_cols])
            ).alias("tagv")
        )
        col = "tagv"
    else:
        raise ValueError(f"unknown suggest kind: {kind!r}")
    return (
        df.select(col)
        .filter(F.col(col).cast("string").startswith(prefix))
        .distinct()
        .orderBy(col)
        .limit(limit)
    )


def lookup(catalog: DataFrame, metric: str | None = None, **tag_eq) -> DataFrame:
    """M2 ``/api/search/lookup``: series matching ``m=metric{tag=v}``."""
    df = catalog
    if metric is not None:
        df = df.filter(F.col("metric") == metric)
    for k, v in tag_eq.items():
        df = df.filter(F.col(f"tag_{k}") == v)
    return df.distinct()


def meta_counts(points: DataFrame) -> DataFrame:
    """M3: per-metric series/point counts for the paged metadata listing."""
    tag_cols = [c for c in points.columns if c.startswith("tag_")]
    return points.groupBy("metric").agg(
        F.countDistinct(*tag_cols).alias("n_series"),
        F.count(F.lit(1)).alias("n_points"),
    )


def delete_series(
    catalog: DataFrame, metric: str | None = None, **tag_eq
) -> DataFrame:
    """M4: remove matching series from the catalog (anti-join rewrite).

    Mycenae deletes only the *metadata* — points expire via keyspace TTL
    (partition-drop in the lake); this mirrors that contract.  Returns the
    new catalog frame; persistent callers overwrite the catalog table with
    it (or express the same predicate as a Delta ``MERGE ... DELETE``).
    """
    victims = lookup(catalog, metric=metric, **tag_eq)
    join_cols = ["metric"] + [f"tag_{k}" for k in tag_eq]
    return catalog.join(victims.select(*join_cols), join_cols, "left_anti")


def meta_page_after(
    catalog: DataFrame,
    page_size: int = 10,
    last_metric: str | None = None,
    last_tag: str | None = None,
    tag_col: str = "tag_user",
) -> DataFrame:
    """M3 deep paging, keyset-style: the page *after* (last_metric,
    last_tag).

    A row_number over the whole catalog pulls every series through one
    partition (single-task sort at 10⁸ series); keyset continuation instead
    filters to keys strictly greater than the cursor — a pushed-down scan
    predicate — and takes the top page_size of what remains
    (TakeOrderedAndProject: per-partition top-K, no global sort shuffle).
    Page N costs the same as page 1 at any catalog size.
    """
    df = catalog
    if last_metric is not None:
        # The cursor comparison must use the tag column's NATIVE type so it
        # agrees with orderBy's ordering (string '10' < '2', long 10 > 2).
        after = (F.col("metric") > last_metric) | (
            (F.col("metric") == last_metric) & (F.col(tag_col) > F.lit(last_tag))
        )
        df = df.filter(after)
    return df.orderBy("metric", tag_col).limit(page_size)


def series_cap_guard(catalog: DataFrame, max_series: int) -> int:
    """L2 MaxTimeseries guard: count matching series pre-flight; raise if
    over cap (mycenae rejects the query rather than truncating)."""
    n = catalog.count()
    if n > max_series:
        raise ValueError(f"query resolves {n} series > MaxTimeseries={max_series}")
    return n
