"""Series catalog ops (SURVEY.md §2.9) + property tests for downsample/fill
invariants (SURVEY.md §5 item 4)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mycenae_spark.catalog import build_catalog, lookup, series_cap_guard, suggest
from mycenae_spark.operators.downsample import downsample
from mycenae_spark.sources.tables import events_as_points

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def points(spark):
    return events_as_points(spark, SF_DIR)


def test_build_catalog_is_distinct_series(points):
    cat = build_catalog(points)
    assert cat.count() == points.select("metric", "tag_user").distinct().count()


def test_suggest_prefix_cap(points):
    cat = build_catalog(points)
    got = [r[0] for r in suggest(cat, "metrics", "c", 2).collect()]
    assert got == ["click"]
    got_all = [r[0] for r in suggest(cat, "metrics", "", 100).collect()]
    assert got_all == sorted(got_all)


def test_lookup(points):
    cat = build_catalog(points)
    rows = lookup(cat, metric="view").collect()
    assert all(r["metric"] == "view" for r in rows)
    one = lookup(cat, metric="view", user=rows[0]["tag_user"]).collect()
    assert len(one) == 1


def test_series_cap_guard(points):
    cat = build_catalog(points)
    n = cat.count()
    assert series_cap_guard(cat, n) == n
    with pytest.raises(ValueError):
        series_cap_guard(cat, n - 1)


# ---------------------------------------------------- downsample invariants

def test_fill_spine_density(points):
    """fill=null emits exactly (hi-lo)/interval + 1 buckets per series."""
    iv = 3_600_000
    filled = downsample(points, ["metric", "tag_user"], iv, "avg", fill="null")
    ext = filled.groupBy("metric", "tag_user").agg(
        F.count(F.lit(1)).alias("n"),
        ((F.max("bucket_ms") - F.min("bucket_ms")) / iv + 1).alias("expect"),
    )
    bad = ext.filter(F.col("n") != F.col("expect")).count()
    assert bad == 0


def test_sum_downsample_partition_sums_equal_total(points):
    """Σ per-bucket sums == Σ raw values (conservation, any interval)."""
    iv = 600_000
    ds = downsample(points, ["metric"], iv, "sum")
    total_ds = ds.agg(F.sum("value")).collect()[0][0]
    total_raw = points.agg(F.sum("value")).collect()[0][0]
    assert abs(total_ds - total_raw) < 1e-6


def test_fill_zero_never_null(points):
    filled = downsample(points, ["metric"], 3_600_000, "avg", fill="zero")
    assert filled.filter(F.col("value").isNull()).count() == 0


def test_delete_series(points):
    from mycenae_spark.catalog import delete_series

    cat = build_catalog(points)
    n0 = cat.count()
    smaller = delete_series(cat, metric="click")
    assert smaller.filter(F.col("metric") == "click").count() == 0
    assert smaller.count() == n0 - cat.filter(F.col("metric") == "click").count()
    # tag-scoped delete removes exactly one series
    one = cat.limit(1).collect()[0]
    scoped = delete_series(cat, metric=one["metric"], user=one["tag_user"])
    assert scoped.count() == n0 - 1


def test_meta_page_keyset_continuation(points):
    """Keyset paging (catalog.meta_page_after) returns the same page-2 rows
    as offset paging, without a global-sort window."""
    from mycenae_spark.catalog import meta_page_after

    cat = build_catalog(points)
    page1 = meta_page_after(cat, page_size=10).collect()
    assert len(page1) == 10
    page2 = meta_page_after(
        cat, page_size=10,
        last_metric=page1[-1]["metric"], last_tag=page1[-1]["tag_user"],
    ).collect()
    all_sorted = sorted(
        ((r["metric"], r["tag_user"]) for r in cat.collect()),
    )
    assert [(r["metric"], r["tag_user"]) for r in page2] == all_sorted[10:20]
