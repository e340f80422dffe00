"""Custom stateful streaming operator: per-series EWMA via
``applyInPandasWithState`` (SURVEY.md §2.11 U5 escape hatch; build brief's
"custom stateful operators" item).

Per series (metric, tag): maintain the exponentially weighted moving average
across micro-batches — the classic TSDB smoothing primitive that *cannot* be
a plain window function on a stream because its state must survive batch
boundaries.

State layout: (last_ewma: double, last_ts_us: long, n_points: long).
Within a batch, rows are folded in event-time order (Arrow batch, pandas
sort — vectorized transfer, per-series loop only over that series' rows in
the batch).  State is keyed by the series, so partitioning/scale behaves
exactly like any keyed aggregation: one shuffle on the series key, state
store entries ∝ #series, not #points.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("metric", StringType(), False),
        StructField("tag_user", LongType(), True),
        StructField("ts_us", LongType(), False),
        StructField("value", DoubleType(), True),
        StructField("ewma", DoubleType(), True),
    ]
)

EWMA_STATE_SCHEMA = StructType(
    [
        StructField("last_ewma", DoubleType(), True),
        StructField("last_ts_us", LongType(), True),
        StructField("n_points", LongType(), True),
    ]
)


def make_ewma_fn(alpha: float = 0.3):
    """Build the per-group stateful function (alpha = smoothing factor)."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ewma, last_ts, n = state.get
        else:
            last_ewma, last_ts, n = None, None, 0
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts_us")
            ewmas = []
            for v in pdf["value"]:
                if v is None or pd.isna(v):
                    ewmas.append(last_ewma)
                    continue
                last_ewma = (
                    float(v)
                    if last_ewma is None
                    else alpha * float(v) + (1 - alpha) * last_ewma
                )
                ewmas.append(last_ewma)
                n += 1
            pdf = pdf.assign(ewma=ewmas)
            if len(pdf):
                last_ts = int(pdf["ts_us"].iloc[-1])
            out.append(
                pdf.assign(metric=key[0], tag_user=key[1])[
                    ["metric", "tag_user", "ts_us", "value", "ewma"]
                ]
            )
        state.update((last_ewma, last_ts, n))
        yield from out

    return fn


def ewma_stream(points: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Apply the stateful EWMA to a streaming points frame.

    ``points`` needs (metric, tag_user, ts, ts_us, value); event-time
    ordering across micro-batches is the file-source order within a bounded
    replay (exact cross-batch ordering on an unbounded stream needs an
    upstream per-key sort, same as any TSDB write path).
    """
    return (
        points.withWatermark("ts", "1 hour")
        .groupBy("metric", "tag_user")
        .applyInPandasWithState(
            make_ewma_fn(alpha),
            outputStructType=EWMA_OUTPUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
