"""Interleaved A/B probe for individual spread_scan sites (r19 VERDICT #1).

    python tools/ab_spread.py <sites> <queries> [cycles] [sf_dir]

``sites``  — comma-separated spread_scan site labels to DISABLE in the OFF
arm (``all-sim`` expands to every functions/similarity.py site).
``queries`` — comma-separated registry query names to time.
``cycles`` — interleaved cycles (default 5); arm order alternates per cycle
(ON,OFF / OFF,ON / ...) so warm-up drift cancels instead of biasing one arm.

Methodology matches bench.py: construct the query fresh per run, time the
terminal ``.count()``; per-query per-arm report = min / median over cycles.
One untimed warm pass (ON arm) first amortizes ensure_* artifact builds the
same way bench.py's extras stage does.  Session: ``local[$SPARK_GRAFT_CPUS]``
(default 32) — driver-like.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALL_SIM_SITES = [
    "sim.brute_topk", "sim.brute_topk_filtered", "sim.kmeans_refine",
    "sim.embedding_lsh", "sim.ivf_assign", "sim.ivf_assign_topn",
    "sim.knn_graph", "sim.semantic_pairs", "sim.sq8_quantized",
    "sim.sq8_rerank",
]


def main() -> int:
    sites_arg = sys.argv[1]
    queries = sys.argv[2].split(",")
    cycles = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    sites = ALL_SIM_SITES if sites_arg == "all-sim" else sites_arg.split(",")

    from mycenae_spark.registry import QUERIES
    from mycenae_spark.session import get_spark
    from mycenae_spark.sources import tables

    spark = get_spark("ab_spread")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    def run(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        return time.perf_counter() - t0

    # Untimed warm pass: builds any ensure_* artifact caches (bench.py's
    # extras stage does the same before its timed reps).
    sc.setJobDescription("ab_spread: warm pass")
    for q in queries:
        run(q)

    results: dict[str, dict[str, list[float]]] = {
        q: {"on": [], "off": []} for q in queries
    }
    for c in range(cycles):
        arms = ["on", "off"] if c % 2 == 0 else ["off", "on"]
        for arm in arms:
            tables.SPREAD_DISABLED = set(sites) if arm == "off" else set()
            for q in queries:
                sc.setJobDescription(f"ab_spread c{c} {arm} {q}")
                results[q][arm].append(run(q))
    tables.SPREAD_DISABLED = set()

    print(f"\n=== A/B spread sites={sites} cycles={cycles} sf={sf_dir} ===")
    print(f"{'query':34s} {'on_min':>7s} {'off_min':>7s} {'on_med':>7s} "
          f"{'off_med':>7s} {'off/on':>7s} verdict")
    for q in queries:
        on, off = results[q]["on"], results[q]["off"]
        r = statistics.median(off) / statistics.median(on)
        verdict = ("OFF wins" if r < 0.93 else
                   "ON wins" if r > 1.08 else "flat")
        print(f"{q:34s} {min(on):7.2f} {min(off):7.2f} "
              f"{statistics.median(on):7.2f} {statistics.median(off):7.2f} "
              f"{r:7.2f} {verdict}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
