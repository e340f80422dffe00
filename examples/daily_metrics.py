"""The daily metrics pipeline as ONE streaming job — the TSDB ingest
bridge.

    python examples/daily_metrics.py

A time-series deployment's daily loop is land points → advance the
rollup/sketch ladders → serve routed downsamples.  Before the bridge,
the second step was an operator's cron discipline; this script runs the
loop as one Structured Streaming job (streaming/tsdb_bridge.py) whose
every micro-batch lands points + fine rollup/KMV/sample partials under
ONE two-phase manifest and then advances the 1h rungs — so the engine's
rung routing is current BY CONSTRUCTION:

    day 1-3 jsonl  →  bridge  →  1h-avg routes onto the cascaded rollup
    rung, 1h-p95 onto the quantile-sample rung (last_routes() shows
    which) — then day 4 lands, the SAME engine routes the extended
    query, no backfill or refresh verb ever called.
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mycenae_spark.session import get_spark  # noqa: E402

HOUR, DAY = 3_600_000, 86_400_000
BASE = 1704067200000  # 2024-01-01T00:00Z


def main() -> None:
    spark = get_spark("daily-metrics-example")
    spark.sparkContext.setLogLevel("ERROR")

    from mycenae_spark.server import Engine
    from mycenae_spark.streaming.assimilate import write_day_files
    from mycenae_spark.streaming.tsdb_bridge import run_tsdb_bridge

    work = tempfile.mkdtemp(prefix="daily_metrics_")
    try:
        lake, cat, ckpt = (os.path.join(work, p) for p in
                           ("lake", "cat", "ckpt"))
        r1m, r1h = os.path.join(work, "r1m"), os.path.join(work, "r1h")
        kmv1m, kmv1h = os.path.join(work, "kmv1m"), os.path.join(work, "kmv1h")
        qs1m, qs1h = os.path.join(work, "qs1m"), os.path.join(work, "qs1h")
        src = os.path.join(work, "src")

        def day_rows(d):
            return [
                json.dumps({
                    "metric": "svc.latency",
                    "tags": {"ksid": "k1", "host": "h0"},
                    "timestamp": BASE + d * DAY + h * HOUR + j * 300_000,
                    "value": float(100 * (d * 24 + h) + j),
                })
                for h in range(24) for j in range(12)
            ]

        def run():
            return run_tsdb_bridge(
                spark, src, lake, cat, ckpt,
                rollup_dir=r1m, ladder={HOUR: r1h},
                kmv_fine_dir=kmv1m, kmv_ladder={HOUR: kmv1h},
                qsample_fine_dir=qs1m, qsample_ladder={HOUR: qs1h},
                max_files_per_trigger=1,
                # retention tail: once the 1h rungs are current over a
                # span past the keep window, the fine 1m partials for it
                # age out (pure partition moves; rung reads unchanged,
                # fine-grain reads below the horizon refuse loudly)
                sketch_retention={
                    "keep_days": 2, "floor_days": 1,
                    "today": datetime.date(2024, 1, 4),
                },
                # GC tail: sweep staging/marker/grace debris older than
                # a day, and bound the commit log — truncation is
                # pin-protected (rung currency stays provable) and
                # clamped to the replay window, so the opt-in is safe
                # on the ingest cadence
                maintenance_max_age_s=86_400.0,
                commitlog_keep_last=10_000,
            )

        write_day_files(
            src, [(f"day{d}.jsonl", day_rows(d)) for d in range(3)]
        )
        stats = run()
        print(f"bridge drained {stats['batches']} crawl days; ladders "
              f"refreshed: {sorted(stats['refreshed'])}; fine partials "
              "pruned: " + "; ".join(
                  f"{fam}={len(r['pruned'])}d"
                  for fam, r in sorted(stats["retention"].items())))

        eng = Engine(spark, lake, cat, rollup_dir=r1m, ladder={HOUR: r1h},
                     qsample_ladder={HOUR: qs1h})

        def q(n_days, ds):
            out = eng.query({
                "start": BASE, "end": BASE + n_days * DAY,
                "queries": [{"metric": "svc.latency", "aggregator": "sum",
                             "downsample": ds}],
            })
            return len(out[0]["dps"]), eng.last_routes()

        n, routes = q(3, "1h-avg")
        print(f"1h-avg : {n} buckets served via {routes}")
        n, routes = q(3, "1h-p95")
        print(f"1h-p95 : {n} buckets served via {routes}")

        # tomorrow: day 4 lands; same checkpoint, one more batch, and
        # the SAME engine routes the extended query — freshness is the
        # ingest transaction's property, not an operator's
        write_day_files(
            src, [(f"day{d}.jsonl", day_rows(d)) for d in range(4)]
        )
        stats = run()
        n, routes = q(4, "1h-avg")
        print(f"day 4 landed ({stats['batches']} new batch); 1h-avg now "
              f"{n} buckets, still via {routes}")
        ret = stats.get("retention", {})
        print("retention: " + "; ".join(
            f"{fam} pruned {len(r['pruned'])} day(s)"
            for fam, r in sorted(ret.items())
        ))
        try:
            eng.query({
                "start": BASE, "end": BASE + 4 * DAY,
                "queries": [{"metric": "svc.latency", "aggregator": "sum",
                             "downsample": "1m-avg"}],
            })
        except ValueError as exc:
            print(f"1m-avg below the horizon refuses loudly: {exc}")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
