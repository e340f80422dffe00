"""Driver-window simulator — the GOLD pre-flight, as one command.

    python tools/verify_window.py [sf_dir] [n]

Replicates what the external driver does each round: a VANILLA
SparkSession (none of our session confs — catches missing-conf and
cloudpickle-by-value bugs that pytest-from-repo-root hides), the FIRST
``n`` (default 50) registry entries in declared order, each executed and
hash-compared against its DuckDB oracle at ``sf_dir`` (default sf0.01)
with the driver's canonicalization (columns sorted by name, floats
rounded to 1e-9, rows sorted).  Run it from anywhere — it does NOT need
the repo on sys.path beforehand.

Exit code 0 iff every window entry passes (rows-only ids pass on
execution).  Use before every end-of-round commit.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        return round(v, 9) + 0.0
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _canon(rows, idx):
    return sorted(
        (tuple(_norm(r[i]) for i in idx) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )  # vanilla on purpose — no mycenae_spark.session confs
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    assert len(entry.entry(spark).collect()) > 0, "entry() returned no rows"
    queries, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    window = list(queries)[:n]
    fails: list[str] = []
    t0 = time.time()
    for name in window:
        try:
            sdf = queries[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"{name}: rows-only {len(srows)}")
                continue
            rel = con.sql(oracles[name])
            si = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
            di = sorted(range(len(rel.columns)), key=lambda i: rel.columns[i])
            if _canon(srows, si) != _canon(rel.fetchall(), di):
                fails.append(name)
                print(f"{name}: HASH-FAIL ({len(srows)} rows)")
            else:
                print(f"{name}: OK {len(srows)}")
        except Exception as exc:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(f"{name}: ERROR {exc}")
    print(
        f"== window {len(window) - len(fails)}/{len(window)} "
        f"in {time.time() - t0:.0f}s; fails: {fails}"
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
