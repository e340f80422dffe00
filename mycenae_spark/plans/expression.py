"""mycenae expression-language parser (SURVEY.md §3.3; upstream ``lib/parser``).

The functional query front-end: a leaf
``query(metric, {tag=v, ...}, relative-time)`` wrapped by combinators

* ``merge(agg, e)``
* ``downsample(interval, agg[, fill], e)``
* ``rate(counter, counterMax, resetValue, e)``
* ``filter(predicate, e)``   — mycenae filterValue, e.g. ``filter(">5", e)``
* ``groupBy({tag=*}) | e``   — grouping prefix

All forms lower to the same ``TsdbQuery`` IR as the OpenTSDB JSON API — the
expression API is a front-end over the same engine, with ``check``/
``compile``/``parse`` endpoints translating between the two representations.
This module is pure Python; Spark is not touched until plan build.
"""

from __future__ import annotations

import re

from mycenae_spark.plans.tsdb import DEFAULT_ORDER, TagFilter, TsdbQuery
from mycenae_spark.schema import parse_relative_time

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<punct>[(){},|])|"
    r"(?P<string>\"[^\"]*\"|'[^']*')|(?P<raw>[^(){},|\s\"']+))"
)


def tokenize(src: str) -> list[str]:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise ValueError(f"bad expression at {src[i:i+20]!r}")
        out.append(m.group().strip())
        i = m.end()
    return out


class _Parser:
    """Recursive descent over the combinator grammar (≈ the reference's
    ``lib/parser`` hand-written parser, reduced to the public function set)."""

    def __init__(self, tokens: list[str], now_ms: int):
        self.toks = tokens
        self.i = 0
        self.now_ms = now_ms

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self, expected: str | None = None) -> str:
        if self.i >= len(self.toks):
            raise ValueError("unexpected end of expression")
        tok = self.toks[self.i]
        if expected is not None and tok != expected:
            raise ValueError(f"expected {expected!r}, got {tok!r}")
        self.i += 1
        return tok

    # --- grammar ---------------------------------------------------------

    def parse(self) -> TsdbQuery:
        group_tags: list[str] = []
        if self.peek() == "groupBy":
            group_tags = self._group_by()
            self.take("|")
        q = self._expr()
        for tagk in group_tags:
            for f in q.filters:
                if f.tagk == tagk:
                    f.group_by = True
                    break
            else:
                q.filters.append(TagFilter(tagk, "wildcard", "*", group_by=True))
        if self.peek() is not None:
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return q

    def _group_by(self) -> list[str]:
        self.take("groupBy")
        self.take("(")
        self.take("{")
        tags = []
        while self.peek() != "}":
            kv = self.take()  # 'host=*' arrives as one raw token
            tags.append(kv.split("=", 1)[0])
            if self.peek() == ",":
                self.take(",")
        self.take("}")
        self.take(")")
        return tags

    def _expr(self) -> TsdbQuery:
        head = self.take()
        if head == "query":
            return self._query_leaf()
        if head == "merge":
            self.take("(")
            agg = self.take()
            self.take(",")
            q = self._expr()
            self.take(")")
            q.aggregator = agg
            return q
        if head == "downsample":
            self.take("(")
            interval = self.take()
            self.take(",")
            agg = self.take()
            self.take(",")
            nxt = self.peek()
            fill = None
            if nxt in ("none", "null", "nan", "zero"):
                fill = self.take()
                self.take(",")
            q = self._expr()
            self.take(")")
            q.downsample = f"{interval}-{agg}" + (f"-{fill}" if fill else "")
            return q
        if head == "rate":
            self.take("(")
            counter = self.take().lower() == "true"
            self.take(",")
            cmax = self.take()
            self.take(",")
            reset = self.take()
            self.take(",")
            q = self._expr()
            self.take(")")
            q.rate = True
            q.counter = counter
            q.counter_max = None if cmax in ("null", "nil", "") else float(cmax)
            q.reset_value = None if reset in ("null", "nil", "0") else float(reset)
            return q
        if head == "filter":
            self.take("(")
            pred = self.take().strip("\"'")
            self.take(",")
            q = self._expr()
            self.take(")")
            q.filter_value = pred
            return q
        raise ValueError(f"unknown function {head!r}")

    def _query_leaf(self) -> TsdbQuery:
        self.take("(")
        metric = self.take()
        self.take(",")
        filters = []
        if self.peek() == "{":
            self.take("{")
            while self.peek() != "}":
                kv = self.take()
                k, v = kv.split("=", 1)
                ftype = "wildcard" if "*" in v else "literal_or"
                filters.append(TagFilter(k, ftype, v))
                if self.peek() == ",":
                    self.take(",")
            self.take("}")
            self.take(",")
        rel = self.take()
        self.take(")")
        start = parse_relative_time(rel, self.now_ms)
        return TsdbQuery(
            metric=metric,
            start_ms=start,
            end_ms=self.now_ms,
            aggregator="sum",
            filters=filters,
            order=DEFAULT_ORDER,
        )


def parse_expression(src: str, now_ms: int) -> TsdbQuery:
    """Compile an expression string to the TsdbQuery IR (the reference's
    ``compile`` endpoint)."""
    return _Parser(tokenize(src), now_ms).parse()


def render_expression(q: TsdbQuery) -> str:
    """IR → expression string (the reference's ``parse`` endpoint direction:
    OpenTSDB JSON ↔ expression are two syntaxes for the same structs)."""
    tags = ",".join(
        f"{f.tagk}={f.filter if isinstance(f.filter, str) else '|'.join(f.filter)}"
        for f in q.filters
    )
    leaf = f"query({q.metric}, {{{tags}}}, {q.start_ms})" if tags else (
        f"query({q.metric}, {q.start_ms})"
    )
    out = leaf
    if q.filter_value:
        out = f'filter("{q.filter_value}", {out})'
    if q.downsample:
        parts = q.downsample.split("-")
        fill = f", {parts[2]}" if len(parts) > 2 else ""
        out = f"downsample({parts[0]}, {parts[1]}{fill}, {out})"
    if q.rate:
        cmax = "null" if q.counter_max is None else int(q.counter_max)
        reset = "null" if q.reset_value is None else int(q.reset_value)
        out = f"rate({str(q.counter).lower()}, {cmax}, {reset}, {out})"
    out = f"merge({q.aggregator}, {out})"
    group = [f.tagk for f in q.filters if f.group_by]
    if group:
        gb = ",".join(f"{k}=*" for k in group)
        out = f"groupBy({{{gb}}}) | {out}"
    return out


def check_expression(src: str, now_ms: int) -> list[str]:
    """The reference's ``check`` endpoint: validate without executing,
    returning a list of problems (empty = valid)."""
    errors: list[str] = []
    try:
        q = parse_expression(src, now_ms)
    except ValueError as exc:
        return [str(exc)]
    from mycenae_spark.operators.merge import AGGREGATORS
    from mycenae_spark.operators.downsample import DOWNSAMPLE_AGGS, FILL_POLICIES
    from mycenae_spark.schema import parse_interval_ms

    if q.aggregator not in AGGREGATORS:
        errors.append(f"unknown aggregator {q.aggregator!r}")
    if q.downsample:
        parts = q.downsample.split("-")
        try:
            parse_interval_ms(parts[0])
        except ValueError as exc:
            errors.append(str(exc))
        if len(parts) < 2 or parts[1] not in DOWNSAMPLE_AGGS:
            errors.append(f"unknown downsample agg in {q.downsample!r}")
        if len(parts) > 2 and parts[2] not in FILL_POLICIES:
            errors.append(f"unknown fill policy in {q.downsample!r}")
    if q.start_ms >= q.end_ms:
        errors.append("empty time range")
    return errors
