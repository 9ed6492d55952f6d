"""CDC upsert materialization — the engine's core stateful operator.

The reference forwards insert/update images and SILENTLY DROPS deletes
(Option.fromNullable(data.new) — reference src/mapping/customMapper.ts:19-23).
This operator implements real I/U/D semantics: given a change log with a
key, a monotonically increasing order column (LSN / ts), and an op column,
produce the current table state:

  - per key, the row with the greatest (order, tiebreak) wins;
  - if that winning row is a delete, the key is absent from the state.

Implementation: window ``row_number() == 1`` per key ordered descending.
Scale: one shuffle on the key; map-side nothing to pre-aggregate, but AQE
skew-join/partition-coalescing keeps partitions balanced. At 100 TB the
change log would be bucketed by key so the window needs no extra shuffle.
This is order-insensitive w.r.t. input partitioning/arrival order (a
shuffled log materializes identically — property-tested).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def latest_state(
    changes: DataFrame,
    keys: list[str],
    order_by: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Materialize current state from a change log (last image per key,
    deletes removing the key)."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col(op_col) != delete_op)
        .drop("__rn")
    )


def merge_batch(state: DataFrame, batch: DataFrame, keys: list[str], order_by: list[str],
                op_col: str = "op", delete_op: str = "D") -> DataFrame:
    """Merge a new micro-batch of changes into an existing materialized state.

    Used by the streaming foreachBatch sink (pgcdc_spark/streaming): state
    rows are treated as upserts that sort before any batch change.
    """
    state_as_changes = state.withColumn(op_col, F.lit("U"))
    for c in batch.columns:
        if c not in state_as_changes.columns:
            state_as_changes = state_as_changes.withColumn(c, F.lit(None))
    combined = state_as_changes.select(batch.columns).unionByName(batch)
    return latest_state(combined, keys, order_by, op_col, delete_op)
