"""As-of join — engine helper (no single Spark built-in; SURVEY.md §2.2).

For each left row, attach the most recent right row (same key) whose
timestamp is <= the left timestamp.

Implementation: union both sides tagged, then a single window pass per key
ordered by (ts, tiebreak): ``last(right_payload, ignorenulls=True)`` over
rows UNBOUNDED PRECEDING..CURRENT ROW carries the latest right image
forward onto every left row.

Scale rationale: this is ONE shuffle on the key (same cost as any keyed
op) and no range/theta join — a naive ``l.ts >= r.ts`` join is O(n*m) per
key and explodes at 100 TB. The window pass is linear per partition and
AQE handles key skew. Right rows at identical (ts, tiebreak) resolve by
the tiebreak column order — pass a unique column for determinism.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tiebreak: str,
    suffix: str = "_asof",
) -> DataFrame:
    """Left rows + latest right payload columns (renamed ``<col><suffix>``)."""
    lcols = left.columns
    tagged_left = left.withColumn("__ts", F.col(left_ts)).withColumn("__is_left", F.lit(1))
    payload_struct = F.struct(*[F.col(c) for c in right_payload])
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

    # Right rows sort before left rows at equal __ts so "<=" semantics hold.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__latest", F.last("__payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("__is_left") == 1).select(
        *lcols,
        *[F.col(f"__latest.{c}").alias(f"{c}{suffix}") for c in right_payload],
    )
    return out
