"""Incremental materialized-view maintenance (IVM): group-by aggregate
views kept current from the CDC stream, without ever rescanning state.

The reference forwards row changes and leaves aggregation to consumers;
a warehouse built on the same feed wants ``SELECT group, SUM(x), COUNT(*)``
continuously correct. Recomputing per batch is O(state); this module
maintains the view from STATE TRANSITIONS instead:

- the bucketed upsert merge already reads the pre-merge content of every
  touched bucket and writes its post-merge content (statestore.merge);
  the view delta of a batch is ``agg(new live rows) - agg(old live rows)``
  over exactly those buckets — O(touched), and correct for inserts,
  updates (old contribution retracted, new added) and deletes, with the
  old image supplied by the STORE, not the feed (pgoutput updates often
  carry no before-image; the state is the before-image);
- deltas land as a per-batch parquet partition (``delta_batch=<label>``),
  and the store's applied-label gate makes (merge + delta + publish)
  replay-exactly-once: a crash before publish recomputes the identical
  delta (same pre-state); a replay after publish is a no-op, so the
  delta log never double-counts — the additive analogue of the
  tombstoned upsert's idempotence;
- the view is the sum of the delta log (one small aggregate at read
  time); ``compact_view`` folds the log into one partition when it grows
  — the same LSM trade the bucket store makes.

This is the classic delta/retraction IVM design (e.g. Materialize/Flink
retraction streams, DBSP) expressed in plain Spark batch primitives.

Scope: SUM/COUNT (and anything derivable from them — AVG, rates) are
fully retractable from deltas. MIN/MAX are NOT: retracting the current
extremum requires the remaining group members, i.e. a per-group re-read
— the standard IVM limitation; serve those from the state table itself
(one touched-bucket aggregate at read time) or keep per-group top-k
support sets, both outside this module's delta-log contract.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from .statestore import BucketedStateStore


class AggView:
    """Sum/count view definition: ``group_cols`` -> SUM(sum_col), COUNT(*)."""

    def __init__(self, name: str, group_cols: list[str], sum_col: str) -> None:
        self.name = name
        self.group_cols = list(group_cols)
        self.sum_col = sum_col

    def _agg(self, df: DataFrame, sign: int) -> DataFrame:
        live = df.filter(F.col("op") != "D")
        return live.groupBy(*self.group_cols).agg(
            (F.lit(sign) * F.sum(F.col(self.sum_col).cast("decimal(28,6)")))
            .alias("sum_delta"),
            (F.lit(sign) * F.count(F.lit(1))).alias("count_delta"),
        )

    def delta(self, current: DataFrame | None, new_state: DataFrame) -> DataFrame:
        """Per-group (sum_delta, count_delta) of the transition."""
        add = self._agg(new_state, +1)
        if current is None:
            return add
        sub = self._agg(current, -1)
        return (
            add.unionByName(sub)
            .groupBy(*self.group_cols)
            .agg(
                F.sum("sum_delta").alias("sum_delta"),
                F.sum("count_delta").alias("count_delta"),
            )
            .filter((F.col("sum_delta") != 0) | (F.col("count_delta") != 0))
        )


def start_upsert_stream_with_view(
    changes: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    view: AggView,
    order_by: list[str] = ("lsn",),
    n_buckets: int = 64,
) -> StreamingQuery:
    """The upsert sink plus continuous view maintenance in one commit unit."""
    store = BucketedStateStore(os.path.join(state_dir, "state"), n_buckets=n_buckets)
    delta_root = os.path.join(state_dir, f"view_{view.name}")

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return

        def on_transition(current, new_state, touched) -> None:
            d = view.delta(current, new_state)
            # idempotent per label: replay-before-publish overwrites with
            # an identical recomputation; replay-after-publish never runs
            # (store label gate)
            d.write.mode("overwrite").parquet(
                os.path.join(delta_root, f"delta_batch={batch_id}")
            )

        store.merge(
            batch_df,
            keys=list(keys),
            order_by=list(order_by),
            label=str(batch_id),
            on_transition=on_transition,
        )

    return (
        changes.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_agg_view(spark: SparkSession, state_dir: str, view: AggView) -> DataFrame:
    """Current view contents: fold the delta log. Groups whose rows are
    all gone net to zero count and drop out."""
    deltas = spark.read.parquet(os.path.join(state_dir, f"view_{view.name}"))
    return (
        deltas.groupBy(*view.group_cols)
        .agg(
            F.sum("sum_delta").cast("double").alias(f"sum_{view.sum_col}"),
            F.sum("count_delta").cast("long").alias("n_rows"),
        )
        .filter(F.col("n_rows") > 0)
    )


def compact_view(spark: SparkSession, state_dir: str, view: AggView) -> None:
    """Fold the delta log into a single base partition (read fan-in bound).
    Not crash-atomic on its own — run it from the maintenance path, not
    concurrently with an active stream."""
    root = os.path.join(state_dir, f"view_{view.name}")
    folded = (
        spark.read.parquet(root)
        .groupBy(*view.group_cols)
        .agg(
            F.sum("sum_delta").alias("sum_delta"),
            F.sum("count_delta").alias("count_delta"),
        )
    ).cache()
    folded.count()
    import shutil

    for d in os.listdir(root):
        shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    folded.write.mode("overwrite").parquet(os.path.join(root, "delta_batch=base"))
    folded.unpersist()
