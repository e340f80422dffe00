"""Counter-rate W6 edge cases (SURVEY.md §7.3 'encode W6 exactly and
property-test'): Spark operator vs an independent Python reference model
over hypothesis-generated series, including wraps and resets."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

import pyspark.sql.functions as F

from mycenae_spark.operators.rate import rate


def reference_rates(points, counter, counter_max, reset_value):
    """Row-at-a-time reference (how the Go engine computes it)."""
    out = []
    for (t0, v0), (t1, v1) in zip(points, points[1:]):
        delta = v1 - v0
        if counter:
            if delta < 0:
                delta = delta + counter_max if counter_max is not None else 0.0
            r = delta / ((t1 - t0) / 1e6)
            if reset_value and r > reset_value:
                r = 0.0
        else:
            r = delta / ((t1 - t0) / 1e6)
        out.append((t1, r))
    return out


series_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=10**9),  # ts deltas (µs)
        st.floats(min_value=0, max_value=1000, allow_nan=False, width=32),
    ),
    min_size=2,
    max_size=12,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=series_strategy,
       counter=st.booleans(),
       counter_max=st.sampled_from([None, 100.0, 1000.0]),
       reset_value=st.sampled_from([None, 50.0]))
def test_rate_matches_reference_model(spark, data, counter, counter_max, reset_value):
    ts, points = 0, []
    for dt, v in data:
        ts += dt
        points.append((ts, float(v)))

    df = spark.createDataFrame(
        [("m", t, v) for t, v in points], ["metric", "ts_us", "value"]
    )
    got = {
        r["ts_us"]: r["value"]
        for r in rate(
            df,
            ["metric"],
            counter=counter,
            counter_max=counter_max,
            reset_value=reset_value,
        ).collect()
    }
    expect = dict(
        reference_rates(points, counter, counter_max, reset_value)
    )
    assert set(got) == set(expect)
    for k in expect:
        assert got[k] == pytest.approx(expect[k], rel=1e-9, abs=1e-12), (
            k, got[k], expect[k])
