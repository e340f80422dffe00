"""Write-path benchmark: streaming ingest (file spool + message bus),
end-to-end visibility latency, and compaction throughput.

The read-path gate lives in bench.py; the reference's production claim is
INGEST scale (SURVEY.md §1: millions of points/min into Cassandra), so
this tool prices the Spark write path at a comparable grain — r9 VERDICT
item 5 asked for exactly this row in BASELINE.md.

Measures, on local[$SPARK_GRAFT_CPUS] over synthesized points (the write
path is scale-invariant in sf; point volume is the knob):

* file-spool ingest: N jsonl points → start_ingest (availableNow) →
  two-phase-commit lake append + catalog merge + 1m rollup partials;
* bus ingest: the same N points published to a topic → drain via the
  custom source → the SAME sink;
* HTTP-put visibility latency: one small engine put → queryable answer
  (the end-to-end "write then read your write" lap, averaged);
* compaction: small-file sweep over the spooled lake.

Prints ONE JSON line:
{"metric": "ingest_bench", "points": N, "file_ingest_s": ..,
 "file_points_per_s": .., "bus_ingest_s": .., "bus_points_per_s": ..,
 "put_visibility_ms": .., "compaction_s": .., "cpus": ..}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_points = int(os.environ.get("SPARK_GRAFT_INGEST_POINTS", "200000"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("mycenae-ingest-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    BASE = 1704067200000
    n_series = 200  # hosts × metrics: realistic fan-in, bounded catalog

    def msg(i: int) -> str:
        return json.dumps({
            "metric": f"bench.m{i % 10}",
            "tags": {"ksid": "k1", "host": f"h{i % (n_series // 10)}"},
            "timestamp": BASE + (i // n_series) * 1000 + (i % n_series),
            "value": float(i % 1000),
        })

    base = tempfile.mkdtemp(prefix="ingest_bench_")
    out: dict = {"metric": "ingest_bench", "points": n_points, "cpus": int(cpus)}
    try:
        # ---- file-spool ingest -----------------------------------------
        from mycenae_spark.streaming.ingest import start_ingest

        src = os.path.join(base, "src")
        os.makedirs(src)
        per_file = 20_000  # spool files of the size a listener batch writes
        for fi in range(0, n_points, per_file):
            with open(os.path.join(src, f"b{fi:09d}.jsonl"), "w") as f:
                f.write("\n".join(
                    msg(i) for i in range(fi, min(fi + per_file, n_points))
                ))
        lake, catalog, ck, roll = (
            os.path.join(base, d) for d in ("lake", "cat", "ck", "rollup")
        )
        t0 = time.time()
        job = start_ingest(spark, src, lake, catalog, ck, rollup_dir=roll)
        job.awaitTermination(600)
        file_s = time.time() - t0
        n_landed = spark.read.parquet(lake).count()
        assert n_landed == n_points, (n_landed, n_points)
        out["file_ingest_s"] = round(file_s, 2)
        out["file_points_per_s"] = int(n_points / file_s)

        # ---- bus ingest -------------------------------------------------
        from mycenae_spark.sources import bus

        topic = os.path.join(base, "topic")
        n_parts = 8  # bus partitions — the Kafka-partition analog
        per_seg = 5_000
        for p in range(n_parts):
            lo = p * (n_points // n_parts)
            hi = (p + 1) * (n_points // n_parts)
            for s in range(lo, hi, per_seg):
                bus.publish(
                    topic, p, [msg(i) for i in range(s, min(s + per_seg, hi))]
                )
        lake2, cat2, ck2, roll2 = (
            os.path.join(base, d) for d in ("lake2", "cat2", "ck2", "rollup2")
        )
        n_bus = n_parts * (n_points // n_parts)
        t0 = time.time()
        job = bus.start_bus_ingest(
            spark, topic, lake2, cat2, ck2, rollup_dir=roll2
        )
        job.awaitTermination(600)
        bus_s = time.time() - t0
        n_landed = spark.read.parquet(lake2).count()
        assert n_landed == n_bus, (n_landed, n_bus)
        out["bus_ingest_s"] = round(bus_s, 2)
        out["bus_points_per_s"] = int(n_bus / bus_s)

        # ---- HTTP-put end-to-end visibility latency --------------------
        from mycenae_spark.server import Engine

        eng = Engine(spark, lake, catalog, rollup_dir=roll)
        eng.checkpoint()  # log-gated reads, the production posture
        laps = []
        for r in range(3):
            t0 = time.time()
            eng.put([{
                "metric": "bench.vis", "tags": {"ksid": "k1", "host": "v"},
                "timestamp": BASE + r * 1000, "value": float(r),
            }])
            got = eng.query({
                "start": BASE, "end": BASE + 10_000,
                "queries": [{"metric": "bench.vis", "aggregator": "sum"}],
            })
            assert got and len(got[0]["dps"]) == r + 1
            laps.append(time.time() - t0)
        out["put_visibility_ms"] = int(min(laps) * 1000)

        # ---- compaction over the spooled lake --------------------------
        from mycenae_spark.maintenance import compact_keyspace

        t0 = time.time()
        stats = compact_keyspace(spark, lake, "k1", min_files=2)
        out["compaction_s"] = round(time.time() - t0, 2)
        out["compaction_files_before"] = sum(b for b, _ in stats.values())
        out["compaction_files_after"] = sum(a for _, a in stats.values())
    finally:
        shutil.rmtree(base, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
