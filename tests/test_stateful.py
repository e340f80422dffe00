"""applyInPandasWithState EWMA: state persists across micro-batches and
matches a sequential reference computation."""

from __future__ import annotations

import pyspark.sql.functions as F

from mycenae_spark.sources.tables import load_table
from mycenae_spark.streaming.stateful import ewma_stream

from tests.conftest import SF_DIR

ALPHA = 0.3


def _reference_ewma(rows):
    """Sequential per-series EWMA over (ts_us, value) tuples."""
    out, last = {}, None
    for ts, v in sorted(rows):
        last = v if last is None else ALPHA * v + (1 - ALPHA) * last
        out[ts] = last
    return out


def test_ewma_stateful_across_batches(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").filter(F.col("event_type") == "click")
    pts = ev.select(
        F.col("event_type").alias("metric"),
        F.col("user_id").alias("tag_user"),
        "ts",
        "ts_us",
        "value",
    )
    # split into two chronological files → two micro-batches sharing state
    cut = pts.approxQuantile("ts_us", [0.5], 0.0)[0]
    src = str(tmp_path / "src")
    pts.filter(F.col("ts_us") <= cut).coalesce(1).write.mode("overwrite").parquet(
        f"{src}/b=1"
    )
    pts.filter(F.col("ts_us") > cut).coalesce(1).write.mode("append").parquet(
        f"{src}/b=2"
    )
    stream = (
        spark.readStream.schema(pts.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/b=*")
    )
    q = (
        ewma_stream(stream, ALPHA)
        .writeStream.format("memory")
        .queryName("t_ewma")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM t_ewma").collect()
    assert got

    by_series: dict = {}
    for r in pts.collect():
        by_series.setdefault(r["tag_user"], []).append((r["ts_us"], r["value"]))
    for r in got:
        exp = _reference_ewma(by_series[r["tag_user"]])
        assert abs(exp[r["ts_us"]] - r["ewma"]) < 1e-9, (
            r["tag_user"], r["ts_us"], r["ewma"], exp[r["ts_us"]])
    # every input row came back exactly once
    assert len(got) == sum(len(v) for v in by_series.values())
