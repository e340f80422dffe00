"""Salted two-phase downsample equals the direct single-shuffle form."""

from __future__ import annotations

import pytest

from mycenae_spark.operators.downsample import downsample
from mycenae_spark.operators.skew import salted_downsample
from mycenae_spark.sources.tables import events_as_points

from tests.conftest import SF_DIR


@pytest.mark.parametrize("agg", ["sum", "count", "min", "max", "avg"])
def test_salted_equals_direct(spark, agg):
    p = events_as_points(spark, SF_DIR)
    direct = {
        (r["metric"], r["bucket_ms"]): r["value"]
        for r in downsample(p, ["metric"], 3_600_000, agg).collect()
    }
    salted = {
        (r["metric"], r["bucket_ms"]): r["value"]
        for r in salted_downsample(p, ["metric"], 3_600_000, agg, n_salts=8).collect()
    }
    assert set(direct) == set(salted)
    for k, v in direct.items():
        assert salted[k] == pytest.approx(v, rel=1e-12)
