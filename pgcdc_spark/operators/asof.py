"""As-of join — engine helper (no single Spark built-in; SURVEY.md §2.2).

For each left row, attach the temporally closest right row with the same
key, under a configurable ``direction``:

- ``backward`` (default): most recent right row with ``r.ts <= l.ts``;
- ``forward``: earliest right row with ``r.ts >= l.ts``;
- ``nearest``: whichever of the two is closer (backward wins exact-
  distance ties);

plus an optional ``tolerance`` (same units as the ts columns, which must
be numeric — the engine's event time is int64 epoch-ns/µs): a candidate
farther than ``tolerance`` from the left timestamp yields NULL payload,
exactly the surface of ``pandas.merge_asof``.

Implementation: union both sides tagged, then window passes per key
ordered by (ts, tiebreak): ``last(payload, ignorenulls=True)`` over
UNBOUNDED PRECEDING..CURRENT ROW carries the latest right image forward
(backward direction); ``first(...)`` over CURRENT ROW..UNBOUNDED
FOLLOWING carries the next right image backward (forward direction).
``nearest`` evaluates both windows — same partitioning, so Catalyst
plans ONE exchange with two sorts — and picks per-row.

Scale rationale: this is ONE shuffle on the key (same cost as any keyed
op) and no range/theta join — a naive ``l.ts >= r.ts`` join is O(n*m) per
key and explodes at 100 TB. The window pass is linear per partition and
AQE handles key skew. Right rows at identical (ts, tiebreak) resolve by
the tiebreak column order — pass a unique column for determinism
(backward picks the largest tiebreak at equal ts, forward the smallest).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

_DIRECTIONS = ("backward", "forward", "nearest")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tiebreak: str,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: int | float | None = None,
) -> DataFrame:
    """Left rows + closest right payload columns (renamed ``<col><suffix>``)."""
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}, got {direction!r}")
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"tolerance must be >= 0, got {tolerance!r}")

    lcols = left.columns
    tagged_left = left.withColumn("__ts", F.col(left_ts)).withColumn("__is_left", F.lit(1))
    # The right timestamp rides inside the payload struct so the tolerance
    # check (and the nearest-side comparison) can see which row matched.
    # It keeps its NATIVE numeric type: casting int64 epoch-ns through
    # double would quantize distances to ~256 ns near 2^60 (a double ulp
    # there), corrupting tolerance and nearest decisions.
    payload_struct = F.struct(
        F.col(right_ts).alias("__rts"),
        *[F.col(c) for c in right_payload],
    )
    tagged_right = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("__ts"),
            F.col(tiebreak).alias("__tie"),
            payload_struct.alias("__payload"),
        )
        .withColumn("__is_left", F.lit(0))
    )
    # Align schemas for the union.
    for c in lcols:
        if c not in tagged_right.columns:
            tagged_right = tagged_right.withColumn(c, F.lit(None))
    tagged_left = tagged_left.withColumn("__payload", F.lit(None).cast(
        tagged_right.schema["__payload"].dataType
    )).withColumn("__tie", F.col(tiebreak) if tiebreak in lcols else F.lit(None))
    unioned = tagged_left.select(
        *lcols, "__ts", "__tie", "__is_left", "__payload"
    ).unionByName(tagged_right.select(*lcols, "__ts", "__tie", "__is_left", "__payload"))

    ts_c = F.col("__ts")

    def within(cand: Column) -> Column:
        """NULL out a candidate whose matched ts is beyond tolerance."""
        if tolerance is None:
            return cand
        delta = F.abs(ts_c - cand["__rts"])
        return F.when(delta <= F.lit(tolerance), cand)

    cands: list[Column] = []
    if direction in ("backward", "nearest"):
        # Right rows sort before left rows at equal __ts so "<=" holds.
        w_b = (
            Window.partitionBy(key)
            .orderBy(F.col("__ts").asc(), F.col("__is_left").asc(), F.col("__tie").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cands.append(within(F.last("__payload", ignorenulls=True).over(w_b)))
    if direction in ("forward", "nearest"):
        # Right rows sort after left rows at equal __ts so ">=" holds.
        w_f = (
            Window.partitionBy(key)
            .orderBy(F.col("__ts").asc(), F.col("__is_left").desc(), F.col("__tie").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        cands.append(within(F.first("__payload", ignorenulls=True).over(w_f)))

    if direction == "nearest":
        back, fwd = cands
        # backward wins ties; a NULL side loses automatically.
        pick = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(F.abs(ts_c - fwd["__rts"]) < F.abs(ts_c - back["__rts"]), fwd)
            .otherwise(back)
        )
    else:
        pick = cands[0]

    carried = unioned.withColumn("__latest", pick)
    out = carried.filter(F.col("__is_left") == 1).select(
        *lcols,
        *[F.col(f"__latest.{c}").alias(f"{c}{suffix}") for c in right_payload],
    )
    return out
