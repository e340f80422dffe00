"""Capture .explain("formatted") for every headline query into plans/<tag>/.

    PLAN_SUFFIX=before|after python tools/capture_plans.py <tag> [sf_dir] [query ...]

Writes ``plans/<tag>/<query>_<suffix>.txt``; ``PLAN_SUFFIX`` (default
``before``) picks the filename suffix — re-running with the same tag AND
suffix overwrites prior captures, so set PLAN_SUFFIX=after for the
post-change capture.  Default queries = the bench HEADLINE list.

The queries are never EXECUTED to completion, but constructing them may
still run real Spark jobs: ``ensure_*`` artifact builds inside a query
function run against their committed caches (cold caches = real builds),
and construction-time probes/counts (e.g. dedup_minhash_pairs_auto's
corpus count) execute as part of building the plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from mycenae_spark.registry import QUERIES  # noqa: E402
from mycenae_spark.session import get_spark  # noqa: E402


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r19"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or HEADLINE
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("mycenae-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    rc = 0
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as ex:  # capture what we can, keep going
            plan = f"ERROR {type(ex).__name__}: {ex}"
            rc = 1
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"{name}: {len(plan)} chars")
    return rc


if __name__ == "__main__":
    sys.exit(main())
