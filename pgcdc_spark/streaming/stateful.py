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
from pyspark.sql.types import StringType, StructField, StructType


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
