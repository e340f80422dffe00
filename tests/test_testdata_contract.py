"""Testdata schema-drift guard (VERDICT r5 item 2).

Round 4/5 outage post-mortem: ``/root/testdata/*/events.parquet`` was silently
regenerated with ``ts`` changing from parquet TIMESTAMP(NANOS) to
``timestamp[us]`` and every points-based query died at analysis time.  These
tests pin the *contract between the testdata and the reader* for every sf dir
so the next regeneration fails a 5-second local test instead of a round:

* ``events_as_points`` must analyze (no UNRESOLVED_COLUMN) for each sf dir;
* its output schema is exactly the points contract, ``ts_us`` bigint;
* ``ts_us`` agrees with DuckDB's ``epoch_us(ts)`` read of the same file
  (the oracle side of every TSDB correctness row).
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

from mycenae_spark.sources.tables import TABLES, events_as_points, load_table

SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))

POINTS_SCHEMA = {
    "metric": "string",
    "tag_user": "bigint",
    "ts": "timestamp",
    "ts_us": "bigint",
    "value": "double",
    "event_id": "bigint",
    "props": "string",
}


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
def test_events_as_points_contract(spark, sf_dir):
    p = events_as_points(spark, sf_dir)
    assert dict(p.dtypes) == POINTS_SCHEMA, (
        f"{sf_dir}: points schema drifted — fix sources/tables.py::load_table"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
def test_all_tables_resolve(spark, sf_dir):
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        assert df.columns, f"{sf_dir}/{name}: empty schema"


def test_ts_us_matches_oracle_epoch_us(spark):
    """ts_us must be the SAME integer DuckDB computes as epoch_us(ts) —
    this equality is the foundation of every TSDB correctness row."""
    sf_dir = SF_DIRS[0]  # smallest dir: whole-table check stays sub-second
    got = {
        r["event_id"]: r["ts_us"]
        for r in events_as_points(spark, sf_dir).select("event_id", "ts_us").collect()
    }
    con = duckdb.connect()
    want = dict(
        con.sql(
            f"SELECT event_id, epoch_us(ts) FROM '{sf_dir}/events.parquet'"
        ).fetchall()
    )
    con.close()
    assert got == want
