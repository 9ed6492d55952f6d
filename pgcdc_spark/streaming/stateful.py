"""Custom stateful streaming operator: per-key CDC latest-state via
``applyInPandasWithState`` (SURVEY.md §2.2 "CDC upsert materialization" —
the one operator Spark has no built-in for).

Complements streaming/pipeline.py's foreachBatch merge: foreachBatch
rewrites a table per micro-batch (simple, great for snapshot-style
sinks); this operator instead keeps the latest image per key in the
STATE STORE and emits only changed keys each batch (update-mode
changelog) — the shape you want when downstream is another stream (e.g.
re-publishing a compacted topic, the reference's Kafka sink R8 done
statefully).

State per key = (order value, op, row image as a JSON string): bounded by
key cardinality, independent of event volume. Arrow moves grouped batches
to Python; per group only a scalar max-compare runs in pandas — the heavy
lifting (grouping/shuffling) stays JVM-side.

Late/duplicate delivery: a change with an order value <= the stored one
is ignored (idempotent replay, same contract as cdc/upsert.latest_state).
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _output_schema(key_fields: list[StructField]) -> StructType:
    return StructType(
        [
            *key_fields,
            StructField("op", StringType()),
            StructField("lsn", StringType()),
            StructField("row_json", StringType()),
        ]
    )


_STATE_SCHEMA = StructType(
    [
        StructField("lsn", StringType()),
        StructField("op", StringType()),
        StructField("row_json", StringType()),
    ]
)


def streaming_latest_state(
    changes: DataFrame,
    keys: list[str],
    order_col: str = "lsn",
    op_col: str = "op",
) -> DataFrame:
    """Changelog-compacting stateful operator.

    Input: the flattened CDC change stream from cdc/transform.apply_pipeline
    (columns: key(s), `op` in I/U/D, an `order_col`, plus image columns).
    Output stream (update mode): one row per key whose state changed in the
    micro-batch — latest op, order value, and the full image as JSON.
    """
    key_fields = [changes.schema[k] for k in keys]
    out_schema = _output_schema(key_fields)
    payload_cols = [c for c in changes.columns if c not in (op_col, order_col)]

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        cur_lsn, cur_op, cur_row = state.get if state.exists else (None, None, None)
        changed = False
        for pdf in pdfs:
            for _, r in pdf.sort_values(order_col).iterrows():
                lsn = r[order_col]
                # idempotent replay: ignore stale or duplicate order values
                if cur_lsn is not None and lsn <= cur_lsn:
                    continue
                cur_lsn = lsn
                cur_op = r[op_col]
                cur_row = json.dumps(
                    {c: (None if pd.isna(r[c]) else str(r[c])) for c in payload_cols}
                )
                changed = True
        if changed:
            state.update((cur_lsn, cur_op, cur_row))
            yield pd.DataFrame(
                {
                    **{f.name: [k] for f, k in zip(key_fields, key)},
                    "op": [cur_op],
                    "lsn": [cur_lsn],
                    "row_json": [cur_row],
                }
            )

    return (
        changes.groupBy(*[F.col(k) for k in keys])
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- cross-batch session windows --------------------------------------------

_SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _session_out_schema(key_fields: list[StructField]) -> StructType:
    return StructType(
        [
            *key_fields,
            StructField("session_start_us", LongType()),
            StructField("session_end_us", LongType()),
            StructField("n_events", LongType()),
            StructField("closed", BooleanType()),
        ]
    )


def streaming_sessions(
    events: DataFrame,
    keys: list[str],
    ts_us_col: str,
    gap_us: int,
) -> DataFrame:
    """Session windows that BRIDGE micro-batch boundaries.

    Built-in ``session_window`` covers the common case; this is the custom
    variant for when session logic must hold auxiliary per-key state (the
    SURVEY §2.2 "custom stateful operator" shape). Per key the state is the
    open session (start, end, count). Each batch: events sorted by time
    extend the open session while gaps stay < ``gap_us``; a larger gap
    CLOSES the session (emitted with closed=true) and opens a new one. The
    still-open session is emitted with closed=false each batch it changes,
    so downstream sees both finalized sessions and live progress.

    State is O(keys), not O(events). Late events older than the open
    session's end merely extend counts (no reordering across a closed
    session — the documented trade-off vs full event-time watermarking).
    """
    key_fields = [events.schema[k] for k in keys]
    out_schema = _session_out_schema(key_fields)

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        start, end, n = state.get if state.exists else (None, None, 0)
        out_rows: list[tuple[int, int, int, bool]] = []
        ts_all: list[int] = []
        for pdf in pdfs:
            ts_all.extend(int(t) for t in pdf[ts_us_col])
        ts_all.sort()
        changed = False
        for t in ts_all:
            if start is None:
                start, end, n = t, t, 1
                changed = True
            elif t - end >= gap_us:
                out_rows.append((start, end, n, True))
                start, end, n = t, t, 1
                changed = True
            else:
                end = max(end, t)
                n += 1
                changed = True
        if start is not None:
            state.update((start, end, n))
        if changed and start is not None:
            out_rows.append((start, end, n, False))
        if out_rows:
            yield pd.DataFrame(
                {
                    **{f.name: [k] * len(out_rows)
                       for f, k in zip(key_fields, key)},
                    "session_start_us": [r[0] for r in out_rows],
                    "session_end_us": [r[1] for r in out_rows],
                    "n_events": [r[2] for r in out_rows],
                    "closed": [r[3] for r in out_rows],
                }
            )

    return (
        events.groupBy(*[F.col(k) for k in keys])
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=_SESSION_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- transformWithStateInPandas (Spark 4 state-v2 API) ------------------------
# The successor API to applyInPandasWithState: typed composite state
# (value/list/map state handles), timers, and TTL, backed by the RocksDB
# state store. Exposed here as a per-key running-stats operator — the
# streaming twin of a groupBy().agg(count/sum/min/max) whose state must
# survive across micro-batches and restarts. At 100 TB the state is
# O(distinct keys) in RocksDB (spillable, incrementally checkpointed),
# not O(events), and only keys touched by a batch are read or emitted.


def streaming_running_stats(
    events: DataFrame,
    keys: list[str],
    amount_col: str,
    ts_us_col: str,
) -> DataFrame:
    """Per-key running (n, total, min_ts, max_ts), emitted for keys updated
    in each micro-batch (update mode).

    Runtime requirements (standard on any Spark 4 cluster): the RocksDB
    state store provider (`spark.sql.streaming.stateStore.providerClass` =
    `...state.RocksDBStateStoreProvider`) and the `protobuf` Python package
    (the state-v2 worker protocol); the test gates on both."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import DoubleType

    key_fields = [events.schema[k] for k in keys]
    out_schema = StructType(
        [
            *key_fields,
            StructField("n_events", LongType()),
            StructField("total", DoubleType()),
            StructField("min_ts_us", LongType()),
            StructField("max_ts_us", LongType()),
        ]
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState(
                "stats",
                "n_events LONG, total DOUBLE, min_ts_us LONG, max_ts_us LONG",
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total, lo, hi = (
                self._stats.get() if self._stats.exists() else (0, 0.0, None, None)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[amount_col].sum())
                b_lo = int(pdf[ts_us_col].min())
                b_hi = int(pdf[ts_us_col].max())
                lo = b_lo if lo is None else min(lo, b_lo)
                hi = b_hi if hi is None else max(hi, b_hi)
            self._stats.update((n, total, lo, hi))
            yield pd.DataFrame(
                {
                    **{f.name: [k] for f, k in zip(key_fields, key)},
                    "n_events": [n],
                    "total": [total],
                    "min_ts_us": [lo],
                    "max_ts_us": [hi],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.groupBy(*[F.col(k) for k in keys])
        .transformWithStateInPandas(
            statefulProcessor=RunningStats(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )


# --- cross-batch EWMA: the streaming twin of queries/timeseries.ewma_segmented

_EWMA_STATE = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("last_event_id", LongType()),
        StructField("ewma", DoubleType()),
        StructField("n_obs", LongType()),
    ]
)


def streaming_ewma(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    val_col: str = "value",
) -> DataFrame:
    """Per-key EWMA (alpha=0.5) maintained ACROSS micro-batches: state is
    the (last order, current ewma, count) triple — O(1) per key, the
    hot-key-safe serving shape the r8 verdict asked for as the streaming
    alternative to whole-series aggregation. Each batch folds its rows
    in (ts, id) order from the stored accumulator, so the emitted value
    is BIT-IDENTICAL to the sequential fold over the full history
    (multiplication by 0.5 is exact; the fold order is the same).

    Exactness contract: batches must arrive in event-time order per key
    (a replayed/late row at or below the stored order is DROPPED,
    idempotent-replay style). For arbitrary out-of-order delivery use
    the batch segmented fold (timeseries.ewma_segmented), which is
    order-free."""
    out_schema = StructType([
        events.schema[key],
        StructField("n_obs", LongType()),
        _EWMA_STATE["ewma"],
    ])

    def update(
        key_tuple: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last_ts, last_id, e, n = (
            state.get if state.exists else (None, None, None, 0)
        )
        changed = False
        for pdf in pdfs:
            for _, r in pdf.sort_values([ts_col, id_col]).iterrows():
                ts, eid = int(r[ts_col]), int(r[id_col])
                if last_ts is not None and (ts, eid) <= (last_ts, last_id):
                    continue  # replay/late: idempotent drop
                x = float(r[val_col])
                e = x if e is None else 0.5 * x + 0.5 * e
                last_ts, last_id, n = ts, eid, n + 1
                changed = True
        if changed:
            state.update((last_ts, last_id, e, n))
            yield pd.DataFrame({key: [key_tuple[0]], "n_obs": [n],
                                "ewma": [e]})

    return (
        events.groupBy(F.col(key))
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=_EWMA_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
