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
    keep_deletes: bool = False,
) -> DataFrame:
    """Materialize current state from a change log (last image per key,
    deletes removing the key).

    ``keep_deletes=True`` keeps the winning delete rows as TOMBSTONES
    instead of dropping them — required whenever the result is merged
    again with more changes (a dropped delete would resurrect the key if
    an older insert arrives in a later/reordered batch). Readers filter
    ``op != delete_op`` at the end; see streaming/pipeline.read_state.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    winners = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if keep_deletes:
        return winners
    return winners.filter(F.col(op_col) != delete_op)


def merge_batch(state: DataFrame, batch: DataFrame, keys: list[str], order_by: list[str],
                op_col: str = "op", delete_op: str = "D") -> DataFrame:
    """Merge a new micro-batch of changes into an existing materialized state.

    Used by the streaming foreachBatch sink (pgcdc_spark/streaming). The
    state is itself a change log compacted to one row per key (op and
    order columns retained, deletes as tombstones), so merging is just
    union + re-compact — commutative across batches, which makes the
    pipeline safe under micro-batch reordering and replay.

    Tombstone retention: unbounded here. At 100 TB with out-of-orderness
    bounded by the source (e.g. one WAL slot), tombstones older than the
    replay horizon can be compacted away periodically.
    """
    combined = state.select(batch.columns).unionByName(batch)
    return latest_state(combined, keys, order_by, op_col, delete_op, keep_deletes=True)
