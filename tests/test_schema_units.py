"""Pure-Python unit/property tests (no Spark): relative time, intervals,
glob translation, filterValue specs (SURVEY.md §5 item 4)."""

from __future__ import annotations

import pytest
from hypothesis import given, strategies as st

from mycenae_spark.operators.filters import filter_value, glob_to_like
from mycenae_spark.schema import parse_interval_ms, parse_relative_time

NOW = 1706745600000


@given(st.integers(min_value=1, max_value=10**6),
       st.sampled_from(["ms", "s", "m", "h", "d", "w", "n", "y"]))
def test_relative_time_is_past_and_monotonic(n, unit):
    t = parse_relative_time(f"{n}{unit}-ago", NOW)
    assert t < NOW
    assert parse_relative_time(f"{n + 1}{unit}-ago", NOW) < t


def test_relative_time_absolute_passthrough():
    assert parse_relative_time(1704067200000, NOW) == 1704067200000
    # seconds normalized to ms (mycenae collector rule)
    assert parse_relative_time(1704067200, NOW) == 1704067200000
    assert parse_relative_time("1704067200", NOW) == 1704067200000


@pytest.mark.parametrize("bad", ["tomorrow", "5x-ago", "-ago", "1h", "h-ago"])
def test_relative_time_rejects(bad):
    with pytest.raises(ValueError):
        parse_relative_time(bad, NOW)


@pytest.mark.parametrize(
    "spec,ms",
    [("1m", 60_000), ("30s", 30_000), ("2h", 7_200_000), ("1d", 86_400_000),
     ("1w", 604_800_000), ("500ms", 500)],
)
def test_interval_parse(spec, ms):
    assert parse_interval_ms(spec) == ms


def test_interval_rejects():
    with pytest.raises(ValueError):
        parse_interval_ms("1y")  # downsample has no year unit (OpenTSDB)


@pytest.mark.parametrize(
    "glob,like",
    [("web*", "web%"), ("*", "%"), ("a*b*c", "a%b%c"),
     ("100%", r"100\%"), ("a_b", r"a\_b")],
)
def test_glob_to_like(glob, like):
    assert glob_to_like(glob) == like


def test_filter_value_ops_parse(spark):
    import pyspark.sql.functions as F

    for spec in (">5", ">=0.2", "<1e3", "<=-4", "==0", "!=7"):
        assert filter_value(F.col("v"), spec) is not None
    with pytest.raises(ValueError):
        filter_value(F.col("v"), "=5")
