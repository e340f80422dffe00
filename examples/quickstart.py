"""Quickstart: the full engine in one script.

    python examples/quickstart.py

Walks the mycenae lifecycle — ingest points (JSON lines, streaming),
query them three ways (OpenTSDB JSON dict, expression string, raw
DataFrame ops) — then the training-data extensions (dedup + similarity +
text analysis) on the bundled testdata.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from mycenae_spark import (  # noqa: E402
    TsdbQuery,
    events_as_points,
    get_spark,
    parse_expression,
    plan,
)
from mycenae_spark.api import render_json, shape_response  # noqa: E402
from mycenae_spark.streaming.ingest import start_ingest  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("quickstart")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="mycenae_quickstart_")

    # -- 1. ingest: JSON point lines → partitioned lake + series catalog --
    src = os.path.join(work, "incoming")
    os.makedirs(src)
    points = [
        {"metric": "cpu.usage", "tags": {"ksid": "demo", "host": f"web{i % 3}"},
         "timestamp": 1704067200000 + i * 30_000, "value": 50 + (i * 7) % 40}
        for i in range(240)
    ]
    with open(os.path.join(src, "points.jsonl"), "w") as f:
        f.write("\n".join(json.dumps(p) for p in points))
    lake, catalog = os.path.join(work, "lake"), os.path.join(work, "catalog")
    start_ingest(spark, src, lake, catalog, os.path.join(work, "ck")).awaitTermination(120)
    print(f"ingested {spark.read.parquet(lake).count()} points, "
          f"{spark.read.parquet(catalog).count()} series → {lake}")

    # -- 2. query, OpenTSDB-style: downsample + merge grouped by host -----
    pts = spark.read.parquet(lake).select(
        "metric",
        F.col("tags")["host"].alias("tag_host"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "value",
    )
    q = TsdbQuery(
        metric="cpu.usage", start_ms=1704067200000, end_ms=1704080000000,
        aggregator="avg", downsample="5m-avg",
        filters=[__import__("mycenae_spark.plans.tsdb", fromlist=["TagFilter"])
                 .TagFilter("host", "wildcard", "web*", group_by=True)],
    )
    payload = shape_response(plan(pts, q), q)
    print("\nOpenTSDB response (truncated):")
    print(render_json(payload)[:300], "…")

    # -- 2b. rollup ladder: long ranges never rescan raw points -----------
    from mycenae_spark.streaming.ingest import decode_json_lines, prepare_points
    from mycenae_spark.streaming.rollup import (
        cascade_rollup, read_rollup_ladder, refresh_ladder, write_rollup_batch,
    )

    fine = os.path.join(work, "rollup_1m")
    valid, _ = prepare_points(decode_json_lines(
        spark.createDataFrame([(json.dumps(p),) for p in points], ["value"])))
    write_rollup_batch(valid, fine, 60_000)
    rungs = {3_600_000: os.path.join(work, "rollup_1h")}
    refresh_ladder(spark, lake, fine, rungs)   # builds the stale 1h rung
    hourly = read_rollup_ladder(spark, {60_000: fine, **rungs},
                                agg="avg", interval_ms=3_600_000)
    print(f"\nladder: 1h-avg served from the cascaded rung → "
          f"{hourly.count()} (series, hour) rows")

    # -- 3. same engine via the expression language -----------------------
    exp = "merge(max, downsample(10m, avg, query(cpu.usage, {host=web1}, 1704067200000)))"
    out = plan(pts, parse_expression(exp, 1704080000000))
    print(f"\nexpression {exp!r} → {out.count()} buckets")

    # -- 4. training-data ops on the bundled corpus -----------------------
    from mycenae_spark.functions.dedup import (
        connected_components, lsh_candidate_pairs, minhash_signatures,
    )
    from mycenae_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    sigs = minhash_signatures(docs, "doc_id", "text")
    pairs = lsh_candidate_pairs(sigs, "doc_id")
    clusters = connected_components(pairs)
    n_members = clusters.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    print(f"\nnear-dup: {pairs.count()} candidate pairs → "
          f"{n_clusters} clusters covering {n_members} docs")

    from mycenae_spark.functions.similarity import brute_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    topk = brute_topk(emb, emb.filter(F.col("vec_id") < 3), k=3)
    print("similarity top-3 for 3 queries:")
    topk.show(9, truncate=False)

    # -- 5. ANN over a materialized PQ index (build once, search many) ----
    from mycenae_spark.functions import pq
    from mycenae_spark.registry.util import r6

    idx = pq.ensure_pq_index(spark, SF_DIR, rounder=r6)
    unitv, cb, codes = pq.load_pq_index(spark, idx)
    ann = pq.adc_search(unitv, cb, codes, F.col("vec_id") < 3, rounder=r6)
    print(f"PQ index at {idx} → ANN top-3 for 3 queries: {ann.count()} rows")

    # -- 6. corpus prep: split / decontaminate / pack ---------------------
    from mycenae_spark.functions.sampling import contamination_pairs, hash_split

    split = hash_split(docs, "doc_id")
    split.groupBy("split").count().orderBy("split").show()
    leaks = contamination_pairs(
        docs.filter(F.col("doc_id") >= 50),
        docs.filter(F.col("doc_id") < 50),
        "doc_id", "text", n=3,
    )
    print(f"decontamination: {leaks.count()} (train, eval) doc pairs "
          "share at least one 3-gram")

    # -- 7. product analytics: funnel stages + cohort retention -----------
    # (served over HTTP by server.py's /api/query/funnel and
    #  /api/query/retention; here the kernels run directly)
    from mycenae_spark.operators.funnel import funnel_stages, retention_matrix

    ev = spark.createDataFrame(
        [("u1", "view", 0), ("u1", "click", 5_000_000),
         ("u1", "purchase", 9_000_000),
         ("u2", "view", 0), ("u2", "click", 30_000_000)],  # outside window
        "user string, metric string, ts_us long",
    )
    fun = funnel_stages(
        ev, "user", "metric", "ts_us",
        ["view", "click", "purchase"], window_us=10_000_000,
    )
    print("\nfunnel (10s windows):")
    fun.orderBy("user_id").show()
    ret = retention_matrix(ev, "user", "ts_us", bucket_us=10_000_000)
    print("retention (10s cohort buckets):")
    ret.orderBy("cohort_bucket", "bucket_offset").show()


if __name__ == "__main__":
    main()
