"""Shared fixtures: one SparkSession per test run + the oracle comparator.

``assert_matches_oracle`` replicates the driver's check (TESTDATA.md): run
the Spark query and the DuckDB SQL on the same parquet dir, sort columns by
name, compare as order-insensitive multisets with exact equality for
ints/strings and tight tolerance for floats.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mycenae_spark.session import get_spark  # noqa: E402
from mycenae_spark.sources.tables import TABLES  # noqa: E402

SF_DIR = os.environ.get("MYCENAE_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mycenae-tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # quantize to kill <1ulp cross-engine noise; queries pre-round floats
        return round(v, 9) + 0.0  # +0.0 canonicalizes -0.0
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def canonical_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


_BANNED_ORACLE_TYPES = ("HUGEINT", "UHUGEINT")


def assert_oracle_types_driver_safe(rel, name=""):
    """The r7 pack_sequences lesson, made structural: DuckDB's Python
    fetchall() converts HUGEINT to int (so this replica compared equal),
    but the driver's pandas-style canonicalization renders HUGEINT /
    UHUGEINT / wide DECIMAL as float — hash-mismatching a value-identical
    result.  Ban those output types outright: any oracle whose window
    ``sum`` (etc.) promotes past BIGINT must cast explicitly."""
    import re

    for col, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        bad = t in _BANNED_ORACLE_TYPES
        m = re.match(r"DECIMAL\((\d+)", t)
        if m and int(m.group(1)) > 18:
            bad = True
        assert not bad, (
            f"{name}: oracle column {col!r} has driver-unsafe type {t} — "
            "cast to BIGINT/DOUBLE in the oracle SQL"
        )


def assert_matches_oracle(spark_df, ddb_con, sql, name=""):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = ddb_con.sql(sql)
    assert_oracle_types_driver_safe(rel, name)
    d_cols = rel.columns
    d_rows = rel.fetchall()
    assert sorted(s_cols) == sorted(
        d_cols
    ), f"{name}: column mismatch {sorted(s_cols)} vs {sorted(d_cols)}"
    assert len(s_rows) == len(
        d_rows
    ), f"{name}: row count {len(s_rows)} vs oracle {len(d_rows)}"
    cs, cd = canonical_rows(s_cols, s_rows), canonical_rows(d_cols, d_rows)
    mismatches = [
        (a, b) for a, b in zip(cs, cd) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[:3]}"
