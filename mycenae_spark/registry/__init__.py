"""The judged query registry: every declared operator from SURVEY.md §2.

Each submodule exports ``QUERIES`` (name → callable(spark, sf_dir) →
DataFrame) and ``ORACLE`` (name → equivalent DuckDB ANSI SQL).  The driver
hash-compares the two at sf0.01 (order-insensitive, columns sorted by name),
so every computed column is aliased identically on both sides and floats are
rounded identically on both sides (registry/util.py conventions).
"""

from __future__ import annotations

from mycenae_spark.registry import llm_queries, relational_queries, tsdb_queries

QUERIES = {
    **tsdb_queries.QUERIES,
    **relational_queries.QUERIES,
    **llm_queries.QUERIES,
}

ORACLE = {
    **tsdb_queries.ORACLE,
    **relational_queries.ORACLE,
    **llm_queries.ORACLE,
}

# Sanity: every oracle entry must have a query (the reverse is allowed —
# rows-only checks for non-SQL-expressible ops).
_extra = set(ORACLE) - set(QUERIES)
assert not _extra, f"oracle entries without queries: {_extra}"
