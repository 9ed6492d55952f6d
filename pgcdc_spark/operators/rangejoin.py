"""Binned (bucketed) range join — interval containment as an equi join.

Spark has no native interval-join operator: a raw ``points.join(intervals,
point BETWEEN start AND end)`` compiles to BroadcastNestedLoopJoin (or a
cartesian product), which is O(|points| x |intervals|) — unusable at scale.
(The reference delegates all join execution to PostgreSQL and performs no
joins itself — SURVEY.md §2.1; this operator is part of the engine's
analytical extension surface.)

The classic fix (used by Spark range-join hints on Databricks, DuckDB's
IEJoin, and stream processors' interval joins) is *binning*: quantize the
number line into fixed-width bins, replicate each interval into every bin
it overlaps, tag each point with the single bin containing it, then
equi-join on the bin id and re-check the exact predicate as a residual.

Properties:
- A (point, interval) match pairs in EXACTLY one bin — the point's own —
  so the join needs no post-dedup.
- Interval replication factor is ``len/bin_width + 1``; pick ``bin_width``
  on the order of the typical interval length to keep it ~2.
- The equi bin key makes the join hash-partitionable: at 100 TB both
  sides shuffle (or the small side broadcasts) on ``__bin`` and Catalyst
  plans a plain hash join — no nested loop anywhere. Hot bins behave like
  any skewed join key (AQE skew split, or compose with operators/salted).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_PBIN, _IBIN = "__pbin", "__ibin"


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    how: str = "inner",
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Join ``points`` to ``intervals`` where
    ``start_col <= point_col <= end_col`` (all numeric, e.g. epoch-µs
    longs), via an equi join on ``floor(x / bin_width)`` bins.

    Column names of the two frames must be disjoint. ``how`` supports
    "inner" and "left_outer" (both are the same single equi join on the
    bin id; the exactly-one-bin-per-point property makes the outer mode
    dedup-free too).
    """
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column names must be disjoint, both have: {sorted(overlap)}")
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported how={how!r} (inner | left_outer)")

    p = points.withColumn(_PBIN, F.floor(F.col(point_col) / bin_width))
    i = intervals.withColumn(
        _IBIN,
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bin_width),
                F.floor(F.col(end_col) / bin_width),
            )
        ),
    )
    if broadcast_intervals:
        # bounded: caller asserts the interval side is dim-sized (API flag)
        i = F.broadcast(i)
    cond = (
        (F.col(_PBIN) == F.col(_IBIN))
        & (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) <= F.col(end_col))
    )
    # Both shapes are ONE equi hash join on the bin id. left_outer is the
    # join's own outer mode — correct without any dedup/remainder pass
    # because a point lives in EXACTLY one bin: each matching interval
    # meets it once (the replica in that bin), and a point with no match
    # in its bin emits one NULL-padded row, which is the outer contract.
    # (r13: this replaced an inner ∪ [points ANTI matched] construction
    # that recomputed the POINTS subtree twice more — fatal when points
    # is an Arrow decode pass — and paid a full-row SortMergeJoin anti.)
    return p.join(i, cond, how).drop(_PBIN, _IBIN)
