"""Message-bus bridge source (sources/bus.py): offset semantics, atomic
publish, replay, and partition discovery — the contract the judged
``bus_ingest_roundtrip`` row exercises end-to-end."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from mycenae_spark.sources import bus


def test_publish_is_atomic_and_ordered(tmp_path):
    topic = str(tmp_path / "t")
    bus.publish(topic, 0, ["a", "b"])
    bus.publish(topic, 0, ["c"])
    # torn publish: a dot-prefixed temp file must be invisible to readers
    pdir = os.path.join(topic, "p=0")
    with open(os.path.join(pdir, ".9999999999-9.jsonl.tmp"), "w") as f:
        f.write("torn\n")
    assert bus._segments(pdir) == ["0000000000-2.jsonl", "0000000001-1.jsonl"]
    assert bus._latest_offsets(topic) == {"0": 3}
    # embedded newlines cannot corrupt framing (one message = one line)
    bus.publish(topic, 1, ["x\ny"])
    rows = list(bus._read_range(os.path.join(topic, "p=1"), 1, 0, 10))
    assert rows == [("x y", 1, 0)]


def test_read_range_skips_whole_segments(tmp_path):
    topic = str(tmp_path / "t")
    bus.publish(topic, 0, [f"m{i}" for i in range(4)])
    bus.publish(topic, 0, [f"m{i}" for i in range(4, 7)])
    bus.publish(topic, 0, [f"m{i}" for i in range(7, 9)])
    pdir = os.path.join(topic, "p=0")
    # range entirely inside segment 2: segments 1 and 3 are never opened
    # (skipping is by filename count — verified by the exact offsets back)
    got = list(bus._read_range(pdir, 0, 4, 7))
    assert got == [("m4", 0, 4), ("m5", 0, 5), ("m6", 0, 6)]
    # range spanning a boundary
    got = list(bus._read_range(pdir, 0, 3, 8))
    assert [v for v, _, _ in got] == ["m3", "m4", "m5", "m6", "m7"]
    assert [o for _, _, o in got] == [3, 4, 5, 6, 7]


def test_batch_reader_and_empty_topic(spark, tmp_path):
    topic = str(tmp_path / "t")
    bus.register(spark)
    # empty topic: zero rows, stable schema
    df = spark.read.format("mycenae_bus").option("path", topic).load()
    assert df.count() == 0
    assert df.columns == ["value", "partition", "offset"]
    bus.publish(topic, 0, ["a", "b"])
    bus.publish(topic, 3, ["c"])
    got = sorted(
        tuple(r)
        for r in spark.read.format("mycenae_bus").option("path", topic)
        .load().collect()
    )
    assert got == [("a", 0, 0), ("b", 0, 1), ("c", 3, 0)]


def test_stream_replay_and_new_partition(spark, tmp_path):
    topic, ck, sink = (
        str(tmp_path / "t"), str(tmp_path / "ck"), str(tmp_path / "sink")
    )
    bus.register(spark)
    bus.publish(topic, 0, [json.dumps({"i": i}) for i in range(5)])

    def run():
        q = (
            spark.readStream.format("mycenae_bus").option("path", topic)
            .load()
            .writeStream.format("parquet").option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    run()
    assert spark.read.parquet(sink).count() == 5
    run()  # replay with nothing new: exactly-once, no duplicates
    assert spark.read.parquet(sink).count() == 5
    # a partition created AFTER checkpoint genesis is discovered
    bus.publish(topic, 1, ["x", "y"])
    run()
    out = spark.read.parquet(sink)
    assert out.count() == 7
    assert out.filter(F.col("partition") == 1).count() == 2
    assert (
        out.groupBy("partition", "offset").count().filter("count > 1").count()
        == 0
    )
