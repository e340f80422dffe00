"""Streaming-mode window/dedup jobs run with availableNow over the events
parquet replayed as a file stream; results compared against the equivalent
batch computation (stream/batch parity — the Structured Streaming promise)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mycenae_spark.sources.tables import events_as_points, load_table
from mycenae_spark.streaming.windows import (
    dedup_stream,
    session_aggregate,
    tumbling_counts,
)

from tests.conftest import SF_DIR


def _events_stream(spark, tmp_path):
    """Replay events as a file stream with the points mapping applied."""
    batch = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "stream_src")
    batch.write.mode("overwrite").parquet(src)
    raw = spark.readStream.schema(batch.schema).parquet(src)
    return raw.select(
        F.col("event_type").alias("metric"),
        F.col("user_id").alias("tag_user"),
        "ts",
        "value",
        "event_id",
    )


def _run_to_memory(spark, df, name, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}")


def test_stream_tumbling_matches_batch(spark, tmp_path):
    stream = _events_stream(spark, tmp_path)
    got = _run_to_memory(
        spark, tumbling_counts(stream), "t_tumbling", mode="append"
    ).collect()
    # append mode emits only watermark-closed windows; with availableNow over
    # a bounded source the final watermark closes all but the trailing hour.
    batch = events_as_points(spark, SF_DIR)
    exp = (
        batch.groupBy("metric", F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("metric", F.unix_millis("w.start").alias("win_start_ms"), "n_events")
    )
    exp_map = {(r["metric"], r["win_start_ms"]): r["n_events"] for r in exp.collect()}
    assert got, "stream produced no closed windows"
    for r in got:
        assert exp_map[(r["metric"], r["win_start_ms"])] == r["n_events"]


def test_stream_dedup_drops_replayed_batch(spark, tmp_path):
    stream = _events_stream(spark, tmp_path)
    out = _run_to_memory(spark, dedup_stream(stream), "t_dedup")
    n = out.count()
    assert n == load_table(spark, SF_DIR, "events").count()
    # ids unique in output even though the source could replay
    assert out.select("event_id").distinct().count() == n


def test_stream_dedup_retransmit_collapses_new_ts(spark, tmp_path):
    """A replayed point with a DIFFERENT timestamp (retransmit stamped at
    receive time) still dedups on event_id via dropDuplicatesWithinWatermark;
    plain (id, ts) dedup would keep both."""
    from mycenae_spark.streaming.windows import dedup_stream_retransmit

    batch = load_table(spark, SF_DIR, "events").limit(500)
    src = str(tmp_path / "retx_src")
    batch.write.mode("overwrite").parquet(src)
    # retransmit copy: same ids, ts shifted 1s forward (still inside the
    # 1h watermark delay of the originals)
    batch.withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 second")).write.mode(
        "append"
    ).parquet(src)
    raw = spark.readStream.schema(batch.schema).parquet(src)
    stream = raw.select(
        F.col("event_type").alias("metric"), "ts", "value", "event_id"
    )
    out = _run_to_memory(spark, dedup_stream_retransmit(stream), "t_retx")
    n = out.count()
    assert n == 500, f"expected 500 unique ids, got {n}"
    assert out.select("event_id").distinct().count() == n


def test_stream_session_counts(spark, tmp_path):
    stream = _events_stream(spark, tmp_path)
    got = _run_to_memory(spark, session_aggregate(stream), "t_session").collect()
    assert got
    # sanity: session starts are valid event times and counts positive
    assert all(r["n_events"] >= 1 for r in got)


def test_stream_stream_join_matches_batch(spark, tmp_path):
    from mycenae_spark.streaming.windows import stream_stream_join

    stream = _events_stream(spark, tmp_path)
    purchases = stream.filter(F.col("metric") == "purchase")
    clicks = stream.filter(F.col("metric") == "click")
    joined = stream_stream_join(purchases, clicks, within="30 minutes")
    got = {
        (r["left_id"], r["right_id"])
        for r in _run_to_memory(spark, joined, "t_ssj").collect()
    }

    batch = events_as_points(spark, SF_DIR)
    p = batch.filter(F.col("metric") == "purchase").select(
        F.col("tag_user").alias("u"), F.col("event_id").alias("pid"),
        F.col("ts").alias("pts"),
    )
    c = batch.filter(F.col("metric") == "click").select(
        F.col("tag_user").alias("u2"), F.col("event_id").alias("cid"),
        F.col("ts").alias("cts"),
    )
    exp = {
        (r["pid"], r["cid"])
        for r in p.join(
            c,
            (p.u == c.u2)
            & (c.cts <= p.pts)
            & (c.cts >= p.pts - F.expr("INTERVAL 30 minutes")),
        ).collect()
    }
    assert got, "stream-stream join produced no rows"
    # streaming output is a subset only via watermark trimming at the bounded
    # stream's tail; with availableNow over one batch it should be complete
    assert got == exp
