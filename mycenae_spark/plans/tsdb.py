"""``TsdbQuery`` IR and the ~100-line planner (SURVEY.md §3.2).

The reference's query lifecycle (upstream ``lib/plot``): parse the OpenTSDB
JSON into query structs; resolve tag filters to series in Solr; fetch points
from Cassandra; then per sub-query apply, in the order given by the mycenae
``order`` extension, any of {downsample, aggregation, rate, filterValue};
finally group by tags and serialize.

Here the planner composes DataFrame stages in that order.  Stage composition
*is* the plan — Catalyst then fuses the filters into the scan (pushdown),
prunes columns, and picks physical operators; §4 of SURVEY.md documents why
zero custom optimizer rules are needed.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from mycenae_spark.operators import filters as flt
from mycenae_spark.operators.downsample import downsample
from mycenae_spark.operators.merge import merge
from mycenae_spark.operators.rate import rate
from mycenae_spark.schema import parse_interval_ms, parse_relative_time

#: mycenae's default pipeline order when the query carries no ``order`` field
#: (SURVEY.md §2.4 W7).
DEFAULT_ORDER = ("downsample", "aggregation", "rate", "filterValue")


@dataclass
class TagFilter:
    tagk: str
    type: str  # literal_or | not_literal_or | iliteral_or | wildcard | iwildcard | regexp
    filter: str | list
    group_by: bool = False


@dataclass
class TsdbQuery:
    """One OpenTSDB sub-query, mycenae-extended (SURVEY.md §3.2 step 1)."""

    metric: str
    start_ms: int
    end_ms: int
    aggregator: str = "sum"
    downsample: str | None = None  # "<interval>-<agg>[-<fill>]"
    rate: bool = False
    counter: bool = False
    counter_max: float | None = None
    reset_value: float | None = None
    filters: list[TagFilter] = field(default_factory=list)
    filter_value: str | None = None
    order: tuple[str, ...] = DEFAULT_ORDER

    @classmethod
    def from_opentsdb(cls, q: dict, sub: dict, now_ms: int) -> "TsdbQuery":
        """Lower one sub-query of an OpenTSDB/mycenae query dict."""
        start = parse_relative_time(q["start"], now_ms)
        end = parse_relative_time(q.get("end", now_ms), now_ms)
        return cls(
            metric=sub["metric"],
            start_ms=start,
            end_ms=end,
            aggregator=sub.get("aggregator", "sum"),
            downsample=sub.get("downsample"),
            rate=bool(sub.get("rate", False)),
            counter=bool((sub.get("rateOptions") or {}).get("counter", False)),
            counter_max=(sub.get("rateOptions") or {}).get("counterMax"),
            reset_value=(sub.get("rateOptions") or {}).get("resetValue"),
            filters=[
                TagFilter(f["tagk"], f["type"], f["filter"], bool(f.get("groupBy")))
                for f in sub.get("filters", [])
            ],
            filter_value=sub.get("filterValue"),
            order=tuple(sub.get("order", DEFAULT_ORDER)),
        )


def plan(points: DataFrame, q: TsdbQuery) -> DataFrame:
    """Lower a TsdbQuery onto a points frame.

    ``points`` must carry columns ``metric``, per-tag columns named
    ``tag_<k>``, ``ts_us`` (BIGINT epoch µs) and ``value``.  Output:
    group-by tag columns + ``bucket_ms`` + ``value``.

    Metric + tag + time predicates go first regardless of ``order`` — they
    are scan predicates (the reference's Solr resolution + Cassandra
    clustering-range read); ``order`` only permutes the math stages, exactly
    as mycenae's ``order`` field does (SURVEY.md §2.4 W7).
    """
    # Tag values are strings in the data model (SURVEY.md §1.1); sources
    # that surface typed tag columns (events.user_id) are normalized here so
    # every filter type (wildcard/regexp/...) applies uniformly.
    for c, dt in points.dtypes:
        if c.startswith("tag_") and dt != "string":
            points = points.withColumn(c, F.col(c).cast("string"))
    df = points.filter(F.col("metric") == q.metric).filter(
        flt.time_range(F.col("ts_us"), q.start_ms * 1000, q.end_ms * 1000)
    )
    for f in q.filters:
        df = df.filter(flt.build_tag_filter(F.col(f"tag_{f.tagk}"), f.type, f.filter))

    group_tags = [f"tag_{f.tagk}" for f in q.filters if f.group_by]
    series_cols = ["metric"] + sorted(
        {c for c in df.columns if c.startswith("tag_")}
    )

    merged = False
    for stage in q.order:
        if stage == "downsample" and q.downsample:
            parts = q.downsample.split("-")
            interval_ms = parse_interval_ms(parts[0])
            agg = parts[1]
            fill = parts[2] if len(parts) > 2 else "none"
            df = downsample(
                df,
                series_cols if not merged else ["metric", *group_tags],
                interval_ms,
                agg,
                ts_us_col="ts_us" if not merged else "bucket_us",
                fill=fill,
            )
            # Re-derive the µs bucket column on BOTH branches: the merged-path
            # downsample also drops bucket_us, and a later rate stage (e.g.
            # order = aggregation → downsample → rate) resolves its ts column
            # from it.
            df = df.withColumn("bucket_us", F.col("bucket_ms") * 1000)
        elif stage == "aggregation" and not merged:
            time_col = "bucket_ms" if "bucket_ms" in df.columns else "ts_us"
            df = merge(df, q.aggregator, ["metric", *group_tags], time_col=time_col)
            if time_col == "ts_us":
                df = df.withColumn("bucket_ms", F.expr("ts_us div 1000")).drop("ts_us")
            df = df.withColumn("bucket_us", F.col("bucket_ms") * 1000)
            merged = True
        elif stage == "rate" and q.rate:
            cols = (["metric", *group_tags]) if merged else series_cols
            ts_col = "bucket_us" if "bucket_us" in df.columns else "ts_us"
            df = rate(
                df,
                cols,
                ts_us_col=ts_col,
                counter=q.counter,
                counter_max=q.counter_max,
                reset_value=q.reset_value,
            )
        elif stage == "filterValue" and q.filter_value:
            df = df.filter(flt.filter_value(F.col("value"), q.filter_value))

    if not merged:
        # No aggregation stage requested: still merge duplicate timestamps
        # per group with the aggregator (OpenTSDB always merges).
        time_col = "bucket_ms" if "bucket_ms" in df.columns else "ts_us"
        df = merge(df, q.aggregator, ["metric", *group_tags], time_col=time_col)
        if time_col == "ts_us":
            df = df.withColumn("bucket_ms", F.expr("ts_us div 1000")).drop("ts_us")

    keep = ["metric", *group_tags, "bucket_ms", "value"]
    return df.select(*[c for c in keep if c in df.columns])
