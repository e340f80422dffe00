"""Primary judged gate, replicated locally: every declared query in the
registry hash-matches its DuckDB oracle on the test scale factor
(SURVEY.md §5 rebuild strategy, item 1)."""

from __future__ import annotations

import pytest

from mycenae_spark.registry import ORACLE, QUERIES

from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_match(spark, ddb, name):
    df = QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, ddb, ORACLE[name], name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only(spark, name):
    """Queries without an oracle (approximate by construction) must still
    run and return a stable schema."""
    df = QUERIES[name](spark, SF_DIR)
    assert df.columns
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(QUERIES) >= set(ORACLE)
