"""Expression-language parser unit tests (SURVEY.md §5 item 3 — mirrors the
reference's parse/compile/check endpoint tests)."""

from __future__ import annotations

import pytest

from mycenae_spark.plans.expression import parse_expression
from mycenae_spark.plans.tsdb import TsdbQuery

NOW = 1706745600000  # 2024-02-01T00:00:00Z


def test_leaf():
    q = parse_expression("query(cpu.usage, {host=web01}, 30m-ago)", NOW)
    assert q.metric == "cpu.usage"
    assert q.start_ms == NOW - 30 * 60_000
    assert q.filters[0].tagk == "host"
    assert q.filters[0].type == "literal_or"


def test_merge_downsample():
    q = parse_expression(
        "merge(avg, downsample(1m, sum, query(net.bytes, {host=*}, 1h-ago)))", NOW
    )
    assert q.aggregator == "avg"
    assert q.downsample == "1m-sum"
    assert q.filters[0].type == "wildcard"


def test_downsample_fill():
    q = parse_expression(
        "downsample(5m, avg, null, query(m, {h=a}, 2h-ago))", NOW
    )
    assert q.downsample == "5m-avg-null"


def test_rate():
    q = parse_expression(
        "rate(true, 1000, 0, query(counter.x, {dc=east}, 1d-ago))", NOW
    )
    assert q.rate and q.counter
    assert q.counter_max == 1000.0
    assert q.reset_value is None


def test_filter_value():
    q = parse_expression('filter(">5", query(m, {h=a}, 1h-ago))', NOW)
    assert q.filter_value == ">5"


def test_group_by_prefix():
    q = parse_expression(
        "groupBy({host=*}) | merge(sum, query(m, {host=web01}, 1h-ago))", NOW
    )
    assert any(f.tagk == "host" and f.group_by for f in q.filters)


def test_nested_full_pipeline():
    q = parse_expression(
        "merge(max, rate(false, null, null, downsample(10m, avg, "
        "query(disk.io, {host=web01,dc=east}, 6h-ago))))",
        NOW,
    )
    assert q.aggregator == "max"
    assert q.rate and not q.counter
    assert q.downsample == "10m-avg"
    assert {f.tagk for f in q.filters} == {"host", "dc"}


def test_errors():
    with pytest.raises(ValueError):
        parse_expression("bogus(1m, query(m, {h=a}, 1h-ago))", NOW)
    with pytest.raises(ValueError):
        parse_expression("query(m, {h=a}, 1h-ago) trailing", NOW)


def test_roundtrip_equivalence_with_opentsdb_dict():
    """compile(expression) ≡ parse(JSON) for the same logical query."""
    exp = parse_expression(
        "merge(avg, downsample(1h, sum, query(m1, {host=a}, 1h-ago)))", NOW
    )
    js = TsdbQuery.from_opentsdb(
        {"start": "1h-ago"},
        {
            "metric": "m1",
            "aggregator": "avg",
            "downsample": "1h-sum",
            "filters": [{"tagk": "host", "type": "literal_or", "filter": "a"}],
        },
        NOW,
    )
    assert (exp.metric, exp.aggregator, exp.downsample) == (
        js.metric,
        js.aggregator,
        js.downsample,
    )
    assert exp.start_ms == js.start_ms


def test_render_roundtrip():
    from mycenae_spark.plans.expression import parse_expression, render_expression

    src = "groupBy({host=*}) | merge(avg, downsample(1h, sum, null, " \
          "rate(true, 1000, null, query(cpu, {host=web01,dc=east}, 1704067200000))))"
    q1 = parse_expression(src, NOW)
    rendered = render_expression(q1)
    q2 = parse_expression(rendered, NOW)
    assert (q1.metric, q1.aggregator, q1.downsample, q1.rate, q1.counter,
            q1.counter_max, q1.start_ms) == (
        q2.metric, q2.aggregator, q2.downsample, q2.rate, q2.counter,
        q2.counter_max, q2.start_ms)
    assert {f.tagk for f in q1.filters} == {f.tagk for f in q2.filters}


def test_check_expression():
    from mycenae_spark.plans.expression import check_expression

    assert check_expression(
        "merge(sum, query(m, {h=a}, 1h-ago))", NOW) == []
    assert check_expression("merge(", NOW)
    assert any("aggregator" in e for e in check_expression(
        "merge(median, query(m, {h=a}, 1h-ago))", NOW))
    # unparseable fill token surfaces as a parse error
    assert check_expression(
        "merge(sum, downsample(1m, avg, weird, query(m, {h=a}, 1h-ago)))", NOW)
    assert any("interval" in e for e in check_expression(
        "merge(sum, downsample(1y, avg, query(m, {h=a}, 1h-ago)))", NOW))
