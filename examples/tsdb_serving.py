"""TSDB serving: the OpenTSDB-compatible engine end-to-end in one script.

    python examples/tsdb_serving.py

The walkthrough a reference (mycenae) operator would follow after
switching to this engine — every stage is the production API, run
against a throwaway lake in a temp dir:

    ingest (HTTP-put path + bus bridge)  →  log-gated checkpoint
        →  rollup ladder (1h rung cascaded from the ingest-maintained
           1m partials, currency-pinned)
        →  queries: raw scan, routed downsample, filters, top-k
        →  per-subquery result cache (hit across an unrelated write)
        →  expression API (check / compile / render / execute)
        →  suggest + HTTP façade over a real socket

Prints a compact trace of what each stage did.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mycenae_spark import get_spark  # noqa: E402

BASE = 1704067200000  # 2024-01-01T00:00:00Z


def main() -> None:
    spark = get_spark("tsdb-serving")
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="tsdb_demo_")
    lake, catalog, roll, rung1h = (
        os.path.join(d, n) for n in ("lake", "catalog", "rollup", "rollup_1h")
    )
    try:
        from mycenae_spark.server import Engine

        eng = Engine(spark, lake, catalog, rollup_dir=roll,
                     ladder={3_600_000: rung1h})

        # 1. Ingest: the HTTP-put path (batched two-phase commit, rollup
        # partials + catalog merge under one manifest).
        res = eng.put([
            {"metric": "cpu.load", "tags": {"ksid": "k1", "host": f"h{i % 2}"},
             "timestamp": BASE + i * 20 * 60_000, "value": float(i % 7)}
            for i in range(72)
        ])
        print(f"put: {res}")

        # ...and the message-bus bridge: same lake, exactly-once offsets.
        from mycenae_spark.sources import bus

        topic, ck = os.path.join(d, "topic"), os.path.join(d, "bus_ck")
        bus.publish(topic, 0, [json.dumps({
            "metric": "cpu.load",
            "tags": {"ksid": "k1", "host": "h0"},
            "timestamp": BASE + 86_400_000 + i * 60_000, "value": 1.0,
        }) for i in range(5)])
        bus.start_bus_ingest(spark, topic, lake, catalog, ck,
                             rollup_dir=roll).awaitTermination(120)
        print("bus ingest: 5 more points through the offset-replay source")

        # 2. Log-gated reads: one checkpoint makes every query resolve its
        # file set from the commit log (torn/foreign files invisible) and
        # arms the per-subquery result cache.
        seq = eng.checkpoint()
        print(f"checkpoint at commit seq {seq} (log-gated reads on)")

        # 3. Materialize the 1h ladder rung from the 1m partials —
        # currency-pinned, so a later write stales it automatically.
        from mycenae_spark.streaming.rollup import cascade_rollup

        cascade_rollup(spark, roll, rung1h, 3_600_000, lake_dir=lake)
        print("ladder: 1h rung cascaded from 1m partials (pinned)")

        # 4. Queries.  The 1h-avg routes onto the rung; the raw query
        # reads points; the filtered one hits the catalog semi-join.
        body = {
            "start": BASE, "end": BASE + 86_400_000,
            "queries": [{"metric": "cpu.load", "aggregator": "sum",
                         "downsample": "1h-avg"}],
        }
        out = eng.query(body)
        print(f"routed 1h-avg: {len(out[0]['dps'])} buckets "
              f"(served from the 1h rung)")
        filt = eng.query({
            "start": BASE, "end": BASE + 86_400_000,
            "queries": [{"metric": "cpu.load", "aggregator": "avg",
                         "filters": [{"type": "literal_or", "tagk": "host",
                                      "filter": "h0", "groupBy": True}]}],
        })
        print(f"filtered h0 avg: {len(filt)} series")

        # 5. Per-subquery cache: repeat of the routed query is a cache
        # hit; a write to an UNRELATED metric does not evict it.
        eng.query(body)
        eng.put([{"metric": "other.metric",
                  "tags": {"ksid": "k1", "host": "h9"},
                  "timestamp": BASE, "value": 1.0}])
        n_cache = len(eng._result_cache)
        eng.query(body)  # still served from cache (per-metric generation)
        print(f"cache: {n_cache} entries survive an unrelated write")

        # 6. Expression API: check → compile → execute.
        from mycenae_spark.plans.expression import (
            check_expression,
            render_expression,
        )

        exp = (f"merge(avg, downsample(1h, sum, "
               f"query(cpu.load, {{host=h0}}, {BASE})))")
        errs = check_expression(exp, BASE + 86_400_000)
        q = eng.query_expression(exp)
        print(f"expression: check={errs or 'ok'}, "
              f"{len(q[0]['dps'])} buckets; canonical="
              f"{render_expression_of(exp, BASE + 86_400_000)!r}")

        # 7. The HTTP façade on a real socket — with a MaxTimeseries cap
        # (over-cap queries 400 pre-flight) and the analytics verbs.
        from mycenae_spark.server import serve

        httpd, _thread = serve(spark, lake, catalog, port=0,
                               rollup_dir=roll, max_series=100)
        port = httpd.server_address[1]
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(
            f"{base}/api/suggest?type=metrics&q=cpu&max=5"
        ) as r:
            print(f"HTTP suggest: {json.loads(r.read())}")

        def post(path, body):
            req = urllib.request.Request(
                f"{base}{path}", data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as resp:
                return json.loads(resp.read())

        # 8. Analytics verbs: newest point per series (keyset-paged) and
        # gap/heartbeat monitoring over the served lake.
        page = post("/keysets/k1/api/query/last", {"limit": 3})
        cursor = page[-1]["key"] if page else None
        print(f"last (page of 3): {len(page)} series; cursor={cursor!r}")
        gaps = post("/keysets/k1/api/query/gaps",
                    {"metric": "cpu.load", "threshold": "2h", "limit": 5})
        # single-point series report max_gap_us = -1 (no interval exists)
        widest = max((g["max_gap_us"] for g in gaps
                      if g["max_gap_us"] is not None), default=-1)
        print(f"gaps: {len(gaps)} series reported, "
              f"max silent window {widest} us")
        httpd.shutdown()
        httpd.server_close()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def render_expression_of(exp: str, now_ms: int) -> str:
    from mycenae_spark.plans.expression import (
        parse_expression,
        render_expression,
    )

    return render_expression(parse_expression(exp, now_ms))


if __name__ == "__main__":
    main()
