"""Tag filters, time-range, and value predicates (SURVEY.md §2.2).

OpenTSDB/mycenae filter types (upstream: filter resolution in ``lib/plot``
translated to Solr queries) map 1:1 onto Catalyst predicates, which then push
down to the parquet scan — the Spark-native equivalent of mycenae resolving
filters in Solr *before* touching Cassandra.

Filter types: ``literal_or``, ``not_literal_or``, ``iliteral_or``,
``wildcard``, ``iwildcard``, ``regexp`` — plus mycenae's ``filterValue``
post-read predicate on the datapoint value and the [start, end) time range
with OpenTSDB's inclusive-start / exclusive-end convention.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def time_range(ts: Column, start, end) -> Column:
    """[start, end): inclusive start, exclusive end (OpenTSDB convention)."""
    return (ts >= F.lit(start)) & (ts < F.lit(end))


def literal_or(col: Column, values: list[str]) -> Column:
    return col.isin(values)


def not_literal_or(col: Column, values: list[str]) -> Column:
    return ~col.isin(values)


def iliteral_or(col: Column, values: list[str]) -> Column:
    return F.lower(col).isin([v.lower() for v in values])


def glob_to_like(pattern: str) -> str:
    """OpenTSDB wildcard (``*`` only) → SQL LIKE pattern.

    ``%`` and ``_`` occurring literally are escaped so only ``*`` globs.
    """
    return pattern.replace("\\", "\\\\").replace("%", r"\%").replace("_", r"\_").replace("*", "%")


def wildcard(col: Column, pattern: str) -> Column:
    return col.like(glob_to_like(pattern))


def iwildcard(col: Column, pattern: str) -> Column:
    return F.lower(col).like(glob_to_like(pattern.lower()))


def regexp(col: Column, pattern: str) -> Column:
    return col.rlike(pattern)


_VALUE_OPS = {
    ">": lambda c, x: c > x,
    ">=": lambda c, x: c >= x,
    "<": lambda c, x: c < x,
    "<=": lambda c, x: c <= x,
    "==": lambda c, x: c == x,
    "!=": lambda c, x: c != x,
}


def filter_value(col: Column, spec: str) -> Column:
    """mycenae ``filterValue`` extension: ``\">5\"``, ``\"<=0.2\"`` … on values.

    (SURVEY.md §2.2 F9; upstream query struct + ``lib/plot`` math.)
    """
    spec = spec.strip()
    for op in (">=", "<=", "==", "!=", ">", "<"):
        if spec.startswith(op):
            return _VALUE_OPS[op](col, float(spec[len(op):]))
    raise ValueError(f"bad filterValue: {spec!r}")


def build_tag_filter(col: Column, ftype: str, arg) -> Column:
    """Dispatch an OpenTSDB filter spec {type, filter} to a predicate."""
    ftype = ftype.lower()
    if ftype == "literal_or":
        return literal_or(col, arg if isinstance(arg, list) else arg.split("|"))
    if ftype == "not_literal_or":
        return not_literal_or(col, arg if isinstance(arg, list) else arg.split("|"))
    if ftype == "iliteral_or":
        return iliteral_or(col, arg if isinstance(arg, list) else arg.split("|"))
    if ftype == "wildcard":
        return wildcard(col, arg)
    if ftype == "iwildcard":
        return iwildcard(col, arg)
    if ftype == "regexp":
        return regexp(col, arg)
    raise ValueError(f"unknown filter type: {ftype!r}")
