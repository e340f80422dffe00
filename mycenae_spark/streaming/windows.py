"""Streaming-mode window aggregations + stateful dedup (SURVEY.md §2.10).

The judged batch forms live in registry/tsdb_queries.py (stream_tumbling /
stream_sliding / stream_session); these are the same computations as real
Structured Streaming jobs — event-time windows with watermarks and
``dropDuplicates`` state — demonstrating the T1–T6 surface end-to-end.

Watermark policy: mycenae itself has no late-data policy (points land
wherever their timestamp says; queries see storage).  The plain ingest sink
therefore uses NO watermark (ingest.py).  Watermarks appear only here,
where *stateful* operators need bounded state — which is a Spark resource
decision, not a semantics change: at 100 TB/day of points the window state
would otherwise grow without bound.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def tumbling_counts(
    points: DataFrame,
    width: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """T3: per-metric tumbling event-time counts/sums on a *stream*.

    Late rows beyond the watermark are dropped (state eviction); on-time
    semantics equal the batch form `stream_tumbling`.
    """
    return (
        points.withWatermark("ts", watermark)
        .groupBy("metric", F.window("ts", width).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_v"))
        .select(
            "metric",
            F.unix_millis(F.col("w.start")).alias("win_start_ms"),
            "n_events",
            "sum_v",
        )
    )


def sliding_counts(
    points: DataFrame,
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """T4: sliding event-time windows on a stream."""
    return (
        points.withWatermark("ts", watermark)
        .groupBy("metric", F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "metric",
            F.unix_millis(F.col("w.start")).alias("win_start_ms"),
            "n_events",
        )
    )


def session_aggregate(
    points: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """T5: session windows with an inactivity gap on a stream."""
    return (
        points.withWatermark("ts", watermark)
        .groupBy("tag_user", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_v"))
        .select(
            "tag_user",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
            "sum_v",
        )
    )


def dedup_stream(points: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """T6: stateful exactly-once-per-id dedup.  The watermark bounds the
    dedup state to ids seen within the lateness horizon — mycenae gets the
    same effect from Cassandra upserts (last write wins per cell)."""
    return points.withWatermark("ts", watermark).dropDuplicates(
        ["event_id", "ts"]
    )


def dedup_stream_retransmit(points: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """T6 variant for *retransmitted* points: ``dropDuplicatesWithinWatermark``
    keys on event_id ONLY, so a re-send that arrives with a different
    timestamp (UDP/telnet retry stamping receive time) still collapses to
    one row — semantics ``dropDuplicates(["event_id", "ts"])`` cannot give,
    because the new ts makes the (id, ts) key unique.

    State eviction contract: an id is remembered until the watermark passes
    the *first* sighting's event time + delay, so state is bounded by ids
    seen within the lateness horizon — same budget as ``dedup_stream``.
    """
    return points.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def enrich_stream(
    points: DataFrame, dim: DataFrame, key: str = "tag_user", how: str = "left"
) -> DataFrame:
    """Stream-static enrichment: join each in-flight point against a
    static dimension table (user segments, metric metadata, keyspace
    config) as it streams past.

    The static side is BROADCAST — per micro-batch Spark re-plans the
    join, so the stream side never shuffles and needs no watermark or
    join state (unlike stream-stream joins): the operator is stateless
    and its cost is one broadcast hash probe per point.  Spark also
    re-reads a file-backed static side at each micro-batch, so slowly
    changing dimensions are picked up without restarting the query."""
    return points.join(F.broadcast(dim), key, how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "tag_user",
    within: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join: pair each left event with right events for
    the same key that occurred at-or-before it within ``within`` (the
    streaming analog of the as-of/window join — e.g. purchases joined to the
    clicks that preceded them).

    Both sides carry watermarks so the join state is bounded: Spark retains
    right rows only until ``watermark + within`` passes — this is the state
    eviction contract that keeps the operator runnable forever at ingest
    scale.  The time-band predicate keeps the join from being a full
    per-key history product.
    """
    l = left.withWatermark("ts", watermark).alias("l")
    r = right.withWatermark("ts", watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("r.ts") <= F.col("l.ts"))
        & (F.col("r.ts") >= F.col("l.ts") - F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner").select(
        F.col(f"l.{key}").alias(key),
        F.col("l.event_id").alias("left_id"),
        F.col("l.ts").alias("left_ts"),
        F.col("r.event_id").alias("right_id"),
        F.col("r.ts").alias("right_ts"),
    )
