"""OpenTSDB-shaped JSON in/out (SURVEY.md §3.2 steps 1 and 6) — thin edge.

``/api/query`` responses:
``[{metric, tags, aggregateTags, dps: {ts_s: value}}]`` — one object per
output group; tag keys aggregated away are listed in ``aggregateTags``.
NaN appears here (fill=nan) and only here: internally empty buckets are
NULL so hash-comparison and Parquet stats stay sane (SURVEY.md §7.3).
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import DataFrame

from mycenae_spark.plans.tsdb import TsdbQuery


def parse_query_request(body: dict, now_ms: int) -> list[TsdbQuery]:
    """POST /keysets/{ks}/api/query body → one IR per sub-query."""
    return [TsdbQuery.from_opentsdb(body, sub, now_ms) for sub in body["queries"]]


def shape_response(
    result: DataFrame, q: TsdbQuery, nan_fill: bool = False
) -> list[dict[str, Any]]:
    """Planner output (metric, tag_*, bucket_ms, value) → OpenTSDB JSON.

    Driver-side shaping of an already-aggregated (small) frame; the heavy
    lifting stayed distributed.  dps keys are epoch seconds as OpenTSDB
    emits them.
    """
    group_tags = [c for c in result.columns if c.startswith("tag_")]
    agg_tags = sorted(
        {f.tagk for f in q.filters if not f.group_by}
        - {c[4:] for c in group_tags}
    )
    groups: dict[tuple, dict[str, Any]] = {}
    for row in result.collect():
        key = tuple(row[c] for c in group_tags)
        g = groups.setdefault(
            key,
            {
                "metric": q.metric,
                "tags": {c[4:]: str(row[c]) for c in group_tags},
                "aggregateTags": agg_tags,
                "dps": {},
            },
        )
        v = row["value"]
        if v is None and nan_fill:
            v = float("nan")
        g["dps"][str(int(row["bucket_ms"] // 1000))] = v
    out = list(groups.values())
    for g in out:
        g["dps"] = dict(sorted(g["dps"].items(), key=lambda kv: int(kv[0])))
    return out


def render_json(payload: Any) -> str:
    """JSON text with OpenTSDB's NaN convention (bare NaN tokens)."""
    import json

    class _E(json.JSONEncoder):
        def default(self, o):  # pragma: no cover
            if isinstance(o, float) and math.isnan(o):
                return "NaN"
            return super().default(o)

    return json.dumps(payload, cls=_E)


AGGREGATORS_ENDPOINT = ["avg", "count", "dev", "max", "min", "p50", "p90", "p95", "p99", "sum", "zimsum", "mimmin", "mimmax"]

FILTERS_ENDPOINT = [
    "literal_or",
    "not_literal_or",
    "iliteral_or",
    "wildcard",
    "iwildcard",
    "regexp",
]
