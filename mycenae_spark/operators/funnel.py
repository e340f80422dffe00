"""Ordered multi-stage funnel over an event stream.

The product-analytics primitive: for each user, did step k's event occur
within ``window_us`` of the MATCHED step k-1 event (not of any event)?
That anchoring-on-the-previous-match is what separates a funnel from N
independent filters, and it is what makes the operator look sequential —
but it decomposes into nested unbounded MIN windows over ONE user
partitioning: step k's candidate set references step k-1's window column,
so Catalyst plans the chain as consecutive Window nodes sharing a single
exchange (plan-asserted in tests/test_plans.py).  At 100 TB a year-long
funnel therefore costs exactly one shuffle of (user, step events) — the
same shape as sessionization.

NULL semantics carry the ordering on any ANSI engine: ``ts >= NULL`` is
NULL, so an unmatched step structurally blanks every later step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def funnel_stages(
    df: DataFrame,
    user_col: str,
    metric_col: str,
    ts_col: str,
    steps: list[str],
    window_us: int,
) -> DataFrame:
    """One row per user: ``<step>_us`` matched timestamps (-1 sentinel),
    ``stage`` = number of consecutive steps reached, ``latency_ms`` =
    first-to-last conversion time (-1 until complete).

    ``steps[0]`` anchors on the user's earliest such event; each later
    step k matches the earliest ``steps[k]`` event in
    ``[t_{k-1}, t_{k-1} + window_us]``.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    u = Window.partitionBy(user_col)
    names = [f"_s{i}" for i in range(len(steps))]
    cur = df.select(user_col, metric_col, ts_col)
    for i, step in enumerate(steps):
        cond = F.col(metric_col) == step
        if i > 0:
            cond = (
                cond
                & (F.col(ts_col) >= F.col(names[i - 1]))
                & (F.col(ts_col) <= F.col(names[i - 1]) + window_us)
            )
        cur = cur.withColumn(
            names[i], F.min(F.when(cond, F.col(ts_col))).over(u)
        )
    mins = [F.max(n) for n in names]  # per-user constants after the windows
    stage = None
    for m in mins:
        term = F.when(m.isNotNull(), 1).otherwise(0)
        stage = term if stage is None else stage + term
    aggs = [
        F.coalesce(m, F.lit(-1)).alias(f"{step}_us")
        for step, m in zip(steps, mins)
    ]
    return cur.groupBy(F.col(user_col).alias("user_id")).agg(
        *aggs,
        stage.alias("stage"),
        F.when(mins[-1].isNotNull(), (mins[-1] - mins[0]) / F.lit(1000))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("latency_ms"),
    )


def retention_matrix(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    bucket_us: int,
) -> DataFrame:
    """Cohort retention matrix: users cohorted by the bucket of their
    FIRST event; cell (cohort_bucket, bucket_offset) counts cohort
    members active ``bucket_offset`` buckets later, with the cohort size
    and the retention rate (unrounded — callers canonicalize).

    Plan shape: the (user, bucket) activity set and the per-user cohort
    frame are BOTH user-keyed aggregates over one scan, so the cohort
    join back onto activity is co-partitioned (AQE reuses the exchange)
    and the final cell aggregate is keyed by (cohort, offset) —
    cardinality #buckets², tiny.  At 100 TB only the initial distinct
    carries event volume, and it collapses map-side to #users × #buckets.
    """
    act = df.select(
        user_col,
        F.expr(f"`{ts_col}` div {int(bucket_us)}").alias("bucket"),
    ).distinct()
    coh = act.groupBy(user_col).agg(F.min("bucket").alias("cohort_bucket"))
    ret = (
        act.join(coh, user_col)
        .groupBy(
            "cohort_bucket",
            (F.col("bucket") - F.col("cohort_bucket")).alias("bucket_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sz = coh.groupBy("cohort_bucket").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return ret.join(sz, "cohort_bucket").select(
        "cohort_bucket",
        "bucket_offset",
        "n_active",
        "cohort_size",
        (F.col("n_active") / F.col("cohort_size").cast("double")).alias(
            "retention"
        ),
    )
