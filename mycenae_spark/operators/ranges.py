"""Interval-overlap join via bin bucketing (SURVEY §2.6 J5's scale form).

Spark has no native interval join: a plain theta join on
``a.start <= b.end AND a.end >= b.start`` plans as
BroadcastNestedLoopJoin / cartesian — O(|L|·|R|) comparisons, the classic
range-join blow-up (`join_range` judges the small-dim broadcast case
where that is fine).  When BOTH sides are large, the standard composition
(genomics/AD-tech interval joins, Spark's own range-join hint on
Databricks) is BIN BUCKETING:

1. pick a bin width ~ the typical interval length,
2. explode each interval into the bins it covers (fan-out =
   ceil(len/bin) + 1 rows per interval),
3. equi-join on the bin key — a plain shuffled hash/sort-merge join,
4. re-check the exact overlap predicate (bin collision is necessary,
   not sufficient) and drop duplicate pairs (an overlapping pair
   collides once per shared bin).

Cost: one keyed exchange of (intervals × fan-out) rows instead of the
all-pairs comparison — linear in data for bounded interval lengths, and
the join parallelizes on the bin key.  The fan-out IS the knob: a bin
much smaller than the intervals multiplies rows; much larger degrades
toward a few giant bins (skew).

Skew valve (``max_bins``): one degenerate interval spanning the whole
timeline would explode into #bins rows AND collide with everything —
exactly the blow-up binning exists to prevent.  Intervals wider than
``max_bins`` bins are DROPPED from the join (the LSH MAX_BUCKET /
capped_assign division of labor: route outliers to a dedicated path —
a broadcast theta join of the handful of giants — instead of poisoning
the bulk plan).  tests/test_skew.py pins the valve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    bin_width: int,
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start",
    right_end: str = "end",
    max_bins: int | None = None,
) -> DataFrame:
    """Pairs (left row, right row) whose CLOSED intervals overlap
    (``l.start <= r.end AND l.end >= r.start``), by bin bucketing.

    Returns left columns + right columns + ``overlap`` =
    ``min(ends) - max(starts)`` (≥ 0 for closed-interval touches).
    The four interval column names must be DISTINCT across the two
    sides (pre-alias before calling — checked, the post-join predicate
    would otherwise be ambiguous).  Intervals must be unit-consistent
    with ``bin_width``.  ``max_bins`` drops intervals covering more
    than that many bins from EITHER side (the skew valve — module
    docstring).

    An overlapping pair collides once per SHARED bin; the join keeps
    only the collision in the pair's FIRST shared bin
    (``bin == max(lo_l, lo_r)`` — the standard dedup-free form), so
    output multiplicity matches the naive theta join exactly, even for
    duplicate input rows, with no distinct shuffle (review finding:
    the earlier ``dropDuplicates`` collapsed identical input rows)."""
    if {left_start, left_end} & {right_start, right_end}:
        raise ValueError(
            "interval_overlap_join: left and right interval columns "
            f"must have distinct names, got {left_start}/{left_end} vs "
            f"{right_start}/{right_end} — alias one side first"
        )

    def binned(df: DataFrame, s: str, e: str, side: str) -> DataFrame:
        lo = F.expr(f"{s} div {bin_width}")
        hi = F.expr(f"{e} div {bin_width}")
        if max_bins is not None:
            df = df.filter(hi - lo < F.lit(max_bins))
        return df.withColumn(f"_{side}lo", lo).withColumn(
            f"_{side}bin", F.explode(F.sequence(lo, hi))
        )

    l = binned(left, left_start, left_end, "l")
    r = binned(right, right_start, right_end, "r")
    joined = (
        l.join(r, l["_lbin"] == r["_rbin"])
        .filter(
            (F.col(left_start) <= F.col(right_end))
            & (F.col(left_end) >= F.col(right_start))
        )
        # first-shared-bin: exactly one surviving collision per pair
        .filter(F.col("_lbin") == F.greatest("_llo", "_rlo"))
    )
    out_cols = [
        c for c in joined.columns
        if c not in ("_lbin", "_rbin", "_llo", "_rlo")
    ]
    return joined.select(*out_cols).withColumn(
        "overlap",
        F.least(F.col(left_end), F.col(right_end))
        - F.greatest(F.col(left_start), F.col(right_start)),
    )
