"""CDC state materialization exercised through the driver oracle.

The engine's core stateful operator (cdc/upsert.py — real I/U/D semantics,
fixing the reference's silent delete drop at src/mapping/customMapper.ts:19)
applied to the `events` table re-read as a change log:

  key      = user_id
  order    = (ts, event_id)        -- the LSN analogue
  op       = 'D' if event_type = 'error' else 'U'

so the materialized state is "latest image per user, unless the user's
latest change is a delete". The oracle expresses the same semantics as a
window query.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves 'pd.Series' annotations here
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import fan_out, load
from ..cdc.upsert import latest_state
from . import query


def pin_capture(msgs: DataFrame, parts: int | None = None) -> DataFrame:
    """Materialize a synthetic capture (bytes-in-storage model) BALANCED.

    Every capture here is built as ``control-frames ∪ encode(events)``:
    the union carries ~33 partitions, but the whole 100k-row payload
    sits in the ONE partition of the events scan, so each downstream
    decode pass pays a serial Python parse PLUS ~32 empty Python tasks
    (each Python task costs ~40 ms of serialized worker acquisition on
    this box — measured r13, OPTIMIZATION_r13.md "CDC family").
    One round-robin shuffle of the already-encoded bytes before the
    localCheckpoint rebalances the stored blocks, so every decode pass
    over the capture parses in parallel with few, full tasks.

    Width: ``defaultParallelism // 4`` (8 on the 32-core bench box,
    scaling down with the driver's lower-core runs) — the measured
    sweet spot for ~100k-frame captures where per-task Python
    acquisition (~40 ms) must stay well under per-task parse work; at
    a real 100 TB capture the bytes arrive from storage with ample
    splits and the pre-checkpoint shuffle is one balanced pass over
    the batch, not a scale hazard (it is the same width the encode's
    own shuffle would need anyway)."""
    spark = msgs.sparkSession
    n = parts or max(2, spark.sparkContext.defaultParallelism // 4)
    return msgs.repartition(n).localCheckpoint()

# DuckDB sees the ns parquet timestamps truncated to us, so ordering uses
# us precision on both sides (ties then broken identically by event_id).
_UPSERT_ORACLE = """
SELECT user_id,
       event_id AS last_event_id,
       event_type AS last_event_type,
       value AS last_value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
"""


@query("cdc_upsert_state", oracle=_UPSERT_ORACLE, tags=("cdc", "upsert"))
def cdc_upsert_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    changes = events.withColumn(
        "op", F.when(F.col("event_type") == "error", "D").otherwise("U")
    ).withColumn("ts_us", F.expr("ts div 1000"))
    state = latest_state(changes, keys=["user_id"], order_by=["ts_us", "event_id"], op_col="op")
    return state.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


_CHANGELOG_ORACLE = """
SELECT
  user_id,
  COUNT(*) AS n_changes,
  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_deletes,
  MIN(epoch_us(ts)) AS first_change_us,
  MAX(epoch_us(ts)) AS last_change_us
FROM events
GROUP BY user_id
"""


@query("cdc_changelog_stats", oracle=_CHANGELOG_ORACLE, tags=("cdc", "agg"))
def cdc_changelog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_changes"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_deletes"),
        F.min(F.expr("ts div 1000")).alias("first_change_us"),
        F.max(F.expr("ts div 1000")).alias("last_change_us"),
    )


# --- Debezium envelope adapter, driven through the oracle gate ---------------
# The events table re-serialized as Debezium-shaped change events (payload.
# before/after/op/source.lsn — the wire format a production CDC feed
# actually arrives in), then parsed by cdc/debezium.parse_debezium and
# materialized by the SAME upsert operator as cdc_upsert_state. Deletes
# travel Debezium-style: image in `before`, `after` null. Half the rows
# use the schemas.enable=true wrapped layout and half the flat layout, so
# both converter configurations are exercised in one query.

_DBZ_ORACLE = """
SELECT user_id, value AS last_value
FROM (
  SELECT user_id, value, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
"""


@query("cdc_debezium_state", oracle=_DBZ_ORACLE, tags=("cdc", "debezium"))
def cdc_debezium_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from ..cdc.debezium import parse_debezium
    from ..cdc.transform import apply_pipeline

    (events,) = load(spark, sf_dir, "events")
    is_del = F.col("event_type") == "error"
    img = F.struct(F.col("user_id"), F.col("value"))
    payload = F.struct(
        F.when(is_del, img).alias("before"),
        F.when(~is_del, img).alias("after"),
        F.struct(
            F.lit("pg").alias("connector"),
            F.col("event_id").alias("lsn"),
        ).alias("source"),
        F.when(is_del, F.lit("d")).otherwise(F.lit("u")).alias("op"),
    )
    raw = events.select(
        F.when(
            F.col("event_id") % 2 == 0,
            F.to_json(F.struct(payload.alias("payload"))),  # wrapped layout
        )
        .otherwise(F.to_json(payload))  # flat layout
        .alias("value")
    )
    row_schema = StructType(
        [StructField("user_id", LongType()), StructField("value", DoubleType())]
    )
    changes = apply_pipeline(parse_debezium(raw, row_schema=row_schema))
    state = latest_state(changes, keys=["user_id"], order_by=["lsn"], op_col="op")
    return state.select(
        "user_id", F.col("value").alias("last_value")
    ).orderBy("user_id")


# --- MongoDB change-stream adapter, driven through the oracle gate ----------
# The events table re-serialized as MongoDB change-stream documents (the
# north star names Mongo CDC alongside Postgres; cdc/mongo.py documents
# the mapping). Two modes, both materialized by engine operators:
#
# cdc_mongo_state      fullDocument=updateLookup mode - every update
#                      carries the full image; parse_mongo_changestream
#                      feeds the SAME apply_pipeline + latest_state path
#                      as pgoutput and Debezium. Ops exercise insert /
#                      replace / update / delete; lsn comes from the
#                      resume token (the clusterTime fallback for
#                      token-less synthetic replays is pytest-covered —
#                      the two encodings don't interleave, cdc/mongo.py).
#
# cdc_mongo_patch_state  no updateLookup - updates carry ONLY
#                      updateDescription (updatedFields/removedFields);
#                      cdc/mongo.patch_state folds patches onto the
#                      latest full-image anchor per key, per field.

_MONGO_ORACLE = """
SELECT user_id, value AS last_value
FROM (
  SELECT user_id, value, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
"""


@query("cdc_mongo_state", oracle=_MONGO_ORACLE, tags=("cdc", "mongo"))
def cdc_mongo_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from ..cdc.mongo import parse_mongo_changestream
    from ..cdc.transform import apply_pipeline

    (events,) = load(spark, sf_dir, "events")
    is_del = F.col("event_type") == "error"
    img = F.struct(F.col("user_id"), F.col("value"))
    op = (
        F.when(is_del, "delete")
        .when(F.col("event_id") % 3 == 0, "insert")
        .when(F.col("event_id") % 3 == 1, "replace")
        .otherwise("update")
    )
    doc = F.struct(
        F.struct(
            F.lpad(F.col("event_id").cast("string"), 40, "0").alias("_data"),
        ).alias("_id"),
        op.alias("operationType"),
        F.struct(
            F.col("event_id").alias("t"), F.lit(0).cast("long").alias("i")
        ).alias("clusterTime"),
        F.when(~is_del, img).alias("fullDocument"),
        F.struct(F.col("user_id")).alias("documentKey"),
        F.struct(F.lit("app").alias("db"), F.lit("events").alias("coll")).alias("ns"),
    )
    raw = events.select(F.to_json(doc).alias("value"))
    row_schema = StructType(
        [StructField("user_id", LongType()), StructField("value", DoubleType())]
    )
    key_schema = StructType([StructField("user_id", LongType())])
    parsed = parse_mongo_changestream(raw, row_schema=row_schema, key_schema=key_schema)
    changes = apply_pipeline(parsed)
    state = latest_state(changes, keys=["user_id"], order_by=["lsn"], op_col="op")
    return state.select("user_id", F.col("value").alias("last_value")).orderBy("user_id")


# Patch mode: full images only on inserts/replaces (event_id % 5 == 0) and
# deletes; every other event is a partial update touching ONE field:
#   % 3 == 0 -> set value        (updatedFields: {"value": ...})
#   % 3 == 1 -> set etype        (updatedFields: {"etype": ...})
#   % 3 == 2 -> remove etype     (removedFields: ["etype"])
# Final state per user: anchor = latest full-image event; each field =
# latest patch after the anchor, else the anchor's field; a user whose
# anchor is a delete is gone unless a later patch recreates the document.
_MONGO_PATCH_ORACLE = """
WITH ev AS (
  SELECT user_id, event_id,
         CASE WHEN event_type = 'error' THEN 'd'
              WHEN event_id % 5 = 0 THEN 'f'
              ELSE 'p' END AS kind,
         value, event_type AS etype
  FROM events
),
anchor AS (
  SELECT user_id,
         MAX_BY(event_id, event_id) AS aid,
         MAX_BY(kind = 'd', event_id) AS adel,
         MAX_BY(value, event_id) AS avalue,
         MAX_BY(etype, event_id) AS aetype
  FROM ev WHERE kind IN ('d', 'f') GROUP BY user_id
),
pv AS (  -- latest value-patch per user after its anchor
  SELECT e.user_id, MAX_BY(e.value, e.event_id) AS pvalue, MAX(e.event_id) AS pid
  FROM ev e LEFT JOIN anchor a USING (user_id)
  WHERE e.kind = 'p' AND e.event_id % 3 = 0 AND (a.aid IS NULL OR e.event_id > a.aid)
  GROUP BY e.user_id
),
pe AS (  -- latest etype set/remove per user after its anchor; the action
         -- is encoded non-null ('S:'||v / 'R') so MAX_BY's winner is
         -- well-defined when the latest action is a remove
  SELECT e.user_id,
         MAX_BY(CASE WHEN e.event_id % 3 = 1 THEN 'S:' || e.etype ELSE 'R' END,
                e.event_id) AS pact,
         MAX(e.event_id) AS pid
  FROM ev e LEFT JOIN anchor a USING (user_id)
  WHERE e.kind = 'p' AND e.event_id % 3 IN (1, 2) AND (a.aid IS NULL OR e.event_id > a.aid)
  GROUP BY e.user_id
),
u AS (
  SELECT user_id FROM anchor
  UNION SELECT user_id FROM pv
  UNION SELECT user_id FROM pe
)
SELECT u.user_id,
       CASE WHEN pv.pid IS NOT NULL THEN pv.pvalue
            WHEN NOT COALESCE(a.adel, FALSE) THEN a.avalue END AS value,
       CASE WHEN pe.pid IS NOT NULL
              THEN CASE WHEN pe.pact LIKE 'S:%' THEN substr(pe.pact, 3) END
            WHEN NOT COALESCE(a.adel, FALSE) THEN a.aetype END AS etype
FROM u
LEFT JOIN anchor a USING (user_id)
LEFT JOIN pv USING (user_id)
LEFT JOIN pe USING (user_id)
WHERE NOT COALESCE(a.adel, FALSE) OR pv.pid IS NOT NULL OR pe.pid IS NOT NULL
ORDER BY user_id
"""


@query("cdc_mongo_patch_state", oracle=_MONGO_PATCH_ORACLE, tags=("cdc", "mongo", "patch"))
def cdc_mongo_patch_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

    from ..cdc.mongo import parse_mongo_changestream, patch_state

    (events,) = load(spark, sf_dir, "events")
    is_del = F.col("event_type") == "error"
    is_full = ~is_del & (F.col("event_id") % 5 == 0)
    is_patch = ~is_del & (F.col("event_id") % 5 != 0)
    img = F.struct(
        F.col("user_id"), F.col("value"), F.col("event_type").alias("etype")
    )
    upd = F.when(
        F.col("event_id") % 3 == 0,
        F.map_from_arrays(
            F.array(F.lit("value")), F.array(F.col("value").cast("string"))
        ),
    ).when(
        F.col("event_id") % 3 == 1,
        F.map_from_arrays(F.array(F.lit("etype")), F.array(F.col("event_type"))),
    )
    rem = F.when(F.col("event_id") % 3 == 2, F.array(F.lit("etype")))
    doc = F.struct(
        F.struct(F.lpad(F.col("event_id").cast("string"), 40, "0").alias("_data")).alias(
            "_id"
        ),
        F.when(is_del, "delete")
        .when(is_full, "replace")
        .otherwise("update")
        .alias("operationType"),
        F.when(is_full, img).alias("fullDocument"),
        F.struct(F.col("user_id")).alias("documentKey"),
        F.when(
            is_patch, F.struct(upd.alias("updatedFields"), rem.alias("removedFields"))
        ).alias("updateDescription"),
    )
    raw = events.select(F.to_json(doc).alias("value"))
    row_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("value", DoubleType()),
            StructField("etype", StringType()),
        ]
    )
    key_schema = StructType([StructField("user_id", LongType())])
    parsed = parse_mongo_changestream(raw, row_schema=row_schema, key_schema=key_schema)
    return patch_state(parsed, row_schema, keys=["user_id"]).orderBy("user_id")


# --- evolving CDC state (online additive schema evolution, driver-checked) ---
# The events table re-read as an envelope stream whose upstream schema
# GROWS mid-stream: changes with event_id >= _EVOLVE_CUTOFF carry an
# extra `k` column (extracted from props) in their row image, earlier
# changes do not — the ALTER TABLE ADD COLUMN scenario the reference is
# blind to (it filters out pgoutput `relation` messages and hard-casts
# images, src/mapping/customMapper.ts:12-22). The engine path under test
# is cdc/evolution.py: map-keyed column discovery (the one sanctioned
# metadata collect), STRING promotion, checked evolving parse, then the
# standard tombstone-aware upsert. Pre-evolution survivors read NULL k.

_EVOLVE_CUTOFF = 500

_EVOLVING_ORACLE = f"""
SELECT user_id, value AS last_value, k AS last_k
FROM (
  SELECT user_id, value,
         CASE WHEN event_id >= {_EVOLVE_CUTOFF}
              THEN json_extract_string(props, '$.k') END AS k,
         event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
"""


@query("cdc_evolving_state", oracle=_EVOLVING_ORACLE, tags=("cdc", "evolution"))
def cdc_evolving_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from ..cdc.evolution import parse_envelope_evolving
    from ..cdc.transform import apply_pipeline

    (events,) = load(spark, sf_dir, "events")
    is_del = F.col("event_type") == "error"
    img = F.struct(
        F.col("user_id"),
        F.col("value"),
        F.when(F.col("event_id") >= _EVOLVE_CUTOFF,
               F.get_json_object("props", "$.k")).alias("k"),
    )
    # lsn = zero-padded event_id so string order == numeric order.
    raw = events.select(
        F.to_json(
            F.struct(
                F.lpad(F.col("event_id").cast("string"), 12, "0").alias("lsn"),
                F.when(is_del, F.lit("delete")).otherwise(F.lit("update")).alias("tag"),
                F.when(~is_del, img).alias("new"),
                F.when(is_del, img).alias("old"),
            )
        ).alias("value")
    )
    base = StructType(
        [StructField("user_id", LongType()), StructField("value", DoubleType())]
    )
    parsed, _schema = parse_envelope_evolving(raw, base_schema=base)
    changes = apply_pipeline(parsed)
    state = latest_state(changes, keys=["user_id"], order_by=["lsn"], op_col="op")
    return state.select(
        "user_id",
        F.col("value").alias("last_value"),
        F.col("k").alias("last_k"),
    ).orderBy("user_id")


# --- online TYPE WIDENING: a known column's type changes mid-stream ----------
# Changes before the cutoff carry val as a JSON integer (milli-scaled
# value); from the cutoff on, the same field carries category labels.
# Without widening, the checked parse would silently NULL every labeled
# value; discover_widened_columns re-declares the column STRING and the
# integer-era values survive as their decimal-string forms.

_WIDEN_CUTOFF = 500

_WIDENING_ORACLE = f"""
SELECT user_id, val AS last_val
FROM (
  SELECT user_id,
         CASE WHEN event_id >= {_WIDEN_CUTOFF}
              THEN (CASE WHEN value >= 0.5 THEN 'hi' ELSE 'lo' END)
              ELSE CAST(CAST(FLOOR(value * 1000) AS BIGINT) AS VARCHAR)
         END AS val,
         event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
"""


@query("cdc_widening_state", oracle=_WIDENING_ORACLE, tags=("cdc", "evolution"))
def cdc_widening_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import LongType, StructField, StructType

    from ..cdc.evolution import parse_envelope_evolving
    from ..cdc.transform import apply_pipeline
    from ..cdc.upsert import latest_state

    (events,) = load(spark, sf_dir, "events")
    is_del = F.col("event_type") == "error"
    lsn = F.lpad(F.col("event_id").cast("string"), 12, "0").alias("lsn")
    tag = F.when(is_del, F.lit("delete")).otherwise(F.lit("update")).alias("tag")

    def envelope(img):
        return F.to_json(F.struct(
            lsn, tag,
            F.when(~is_del, img).alias("new"),
            F.when(is_del, img).alias("old"),
        )).alias("value")

    int_img = F.struct(
        F.col("user_id"),
        F.floor(F.col("value") * 1000).cast("long").alias("val"),
    )
    label_img = F.struct(
        F.col("user_id"),
        F.when(F.col("value") >= 0.5, "hi").otherwise("lo").alias("val"),
    )
    raw = (
        events.filter(F.col("event_id") < _WIDEN_CUTOFF).select(envelope(int_img))
        .unionByName(
            events.filter(F.col("event_id") >= _WIDEN_CUTOFF).select(envelope(label_img))
        )
    )
    base = StructType([StructField("user_id", LongType()),
                       StructField("val", LongType())])
    parsed, schema = parse_envelope_evolving(raw, base_schema=base)
    assert dict((f.name, f.dataType.simpleString()) for f in schema.fields)["val"] == "string"
    changes = apply_pipeline(parsed)
    state = latest_state(changes, keys=["user_id"], order_by=["lsn"], op_col="op")
    return state.select("user_id", F.col("val").alias("last_val")).orderBy("user_id")


# --- snapshot-then-stream cutover (R2 + R1 reconciliation) --------------------
# The reference has BOTH ingestion paths — the R2 snapshot batch read
# (src/database/postgresql/PostgresOperation.ts:69-86) and the R1 logical
# stream (src/database/postgresql/PostgresLogicalPg.ts:30-42) — but no
# cutover story between them: a consumer that snapshots and then
# subscribes has no defined semantics for changes that landed during the
# snapshot, and Debezium-style feeds deliberately REPLAY an overlap
# window around the snapshot position (at-least-once delivery across the
# handoff). This query proves the engine's reconciliation: seed the
# state with the snapshot (each row carrying its own source LSN, the
# Debezium snapshot convention; a snapshot has no tombstones — deleted
# keys are simply absent), union the stream WITH the overlap window
# re-delivered, and let the same LWW max_by merge resolve everything.
# Double-delivered rows lose to (or tie with, payload-identically) the
# snapshot image; deletes inside the overlap re-tombstone keys the
# snapshot already dropped — both no-ops. The oracle is the full-log
# replay: agreement proves snapshot + overlapping stream == replaying
# the entire history, i.e. the cutover loses nothing and duplicates
# nothing. Scale shape: the union is one lazy plan into ONE skew-
# resistant max_by aggregate (map-side combine), same single shuffle as
# cdc_upsert_state — the snapshot seed adds no extra stage.

_SNAP_CUT = 500      # snapshot position: table state as of event_id < 500
_SNAP_OVERLAP = 300  # stream replays from 300: [300, 500) delivered twice

_SNAPSHOT_CUTOVER_ORACLE = """
SELECT user_id,
       event_id AS last_event_id,
       event_type AS last_event_type,
       value AS last_value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
"""


@query("cdc_snapshot_cutover_state", oracle=_SNAPSHOT_CUTOVER_ORACLE,
       tags=("cdc", "snapshot", "upsert"))
def cdc_snapshot_cutover_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    changes = events.select(
        "event_id", "user_id", "event_type", "value",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
    )
    snapshot = latest_state(
        changes.filter(F.col("event_id") < _SNAP_CUT),
        keys=["user_id"], order_by=["event_id"],
    )
    stream = changes.filter(F.col("event_id") >= _SNAP_OVERLAP)
    state = latest_state(
        snapshot.unionByName(stream),
        keys=["user_id"], order_by=["event_id"],
    )
    return state.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


# --- time travel (VERSION AS OF over the bucketed state store) ---------------
# The state store retains its publish history (bounded manifests, no
# data copied), so any committed batch boundary can be read back — the
# table-format "VERSION AS OF" verb, previously suite-visible only
# (tests/test_streaming.py). This query drives it through the driver
# oracle: apply the standard 3-batch I/U/D changelog, then read the
# state AS OF batch 1 — i.e. an EARLIER version than the latest commit,
# proving the historical manifest still reconstructs exactly (batch 2's
# updates/deletes are absent, batch 0/1 tombstones still respected).
# Oracle: LWW replay restricted to the first two batches' rows. Scale
# shape: as-of reads serve straight from retained bucket manifests —
# O(1) metadata to pick the version, then the same pruned bucket scan
# as a current-state read; nothing is reconstructed or copied.

_TT_ORACLE = """
SELECT user_id,
       event_id AS last_event_id,
       value AS last_value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE event_id % 3 IN (0, 1)
) WHERE rn = 1 AND event_type <> 'error'
"""


@query("cdc_time_travel_state", oracle=_TT_ORACLE,
       tags=("cdc", "state", "time-travel"))
def cdc_time_travel_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..streaming.statestore import BucketedStateStore
    from .ivm_views import _events_changelog, _maintained_dir

    def build(state_dir: str) -> None:
        store = BucketedStateStore(
            os.path.join(state_dir, "state"), n_buckets=8)
        log = _events_changelog(spark, sf_dir)
        for b in range(3):
            store.merge(
                log.filter(F.col("batch") == b).drop("batch"),
                keys=["user_id"], order_by=["ts_us", "event_id"],
                label=str(b),
            )

    state_dir = _maintained_dir("timetravel", sf_dir, ("events",), build)
    store = BucketedStateStore(os.path.join(state_dir, "state"), n_buckets=8)
    asof = store.read_asof(spark, "1")  # batch 2 is committed but unseen
    return asof.filter(F.col("op") != "D").select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_value"),
    )


# --- pgoutput BINARY wire format, decoded in-engine ---------------------------
# The reference consumes pgoutput through the pg-logical-replication npm
# package and never sees the bytes; cdc/pgoutput.py implements the
# documented binary message layout itself, so the engine can ingest raw
# XLogData payloads with no decode sidecar. This query drives the full
# binary path under the driver gate: events re-encoded as byte-exact
# R/I/U/D messages (plus begin/commit control frames and one corrupt
# message, exercising the filter and dead-letter paths), relation
# metadata discovered in the bounded first pass, rows decoded via
# Arrow mapInPandas into the SAME envelope frame the JSON adapters
# emit, then the unchanged filter -> extract -> upsert pipeline. Float
# round-trip: Python repr() text is shortest-round-trip, so the decoded
# doubles are bit-identical to the originals and the oracle compares
# exact values. The byte layout itself is pinned by hand-written
# literal bytes in tests/test_cdc.py (encoder and decoder cannot drift
# together).

_PGOUT_ORACLE = """
SELECT user_id, value AS last_value
FROM (
  SELECT user_id, value, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
"""


@query("cdc_pgoutput_state", oracle=_PGOUT_ORACLE,
       tags=("cdc", "pgoutput", "binary"))
def cdc_pgoutput_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from ..cdc.pgoutput import decode_pgoutput, encode_relation
    from ..cdc.transform import apply_pipeline

    (events,) = load(spark, sf_dir, "events")

    @pandas_udf("binary")
    def enc(event_id: pd.Series, user_id: pd.Series, value: pd.Series,
            etype: pd.Series) -> pd.Series:
        from ..cdc.pgoutput import (
            encode_delete, encode_insert, encode_update)

        out = []
        for eid, uid, val, et in zip(event_id, user_id, value, etype):
            vals = [int(uid), repr(float(val))]
            if et == "error":
                out.append(encode_delete(1, vals))
            elif int(eid) % 3 == 0:
                out.append(encode_insert(1, vals))
            else:
                out.append(encode_update(1, vals))
        return pd.Series(out)

    rel = spark.createDataFrame(
        [(0, bytearray(encode_relation(1, "public", "events",
                                       ["user_id", "value"])))],
        "lsn long, payload binary",
    )
    msgs = rel.unionByName(
        events.select(
            (F.col("event_id") + 1).alias("lsn"),
            enc("event_id", "user_id", "value", "event_type").alias("payload"),
        )
    )
    # localCheckpoint (r13): decode_pgoutput's relation auto-discovery is
    # a SEPARATE job over msgs, so the unpinned plan runs the Arrow
    # encode once for discovery and again for the decode pass (guide §4 —
    # the filter on payload's first byte cannot prune the UDF that
    # produces payload). Checkpointing runs the encode exactly once and
    # serves both passes from stored blocks — the same bytes-in-storage
    # model every capture fixture (toast/stream/2PC/origin) already uses.
    msgs = pin_capture(msgs)
    row_schema = StructType(
        [StructField("user_id", LongType()), StructField("value", DoubleType())]
    )
    changes = apply_pipeline(decode_pgoutput(msgs, row_schema))
    state = latest_state(changes, keys=["user_id"], order_by=["lsn"], op_col="op")
    return state.select(
        "user_id", F.col("value").alias("last_value")
    ).orderBy("user_id")


# --- wal2json adapter, driven through the oracle gate -------------------------
# The OTHER decoding plugin (the reference's config selects plugins by
# name, src/config/config.ts:21-24): transaction envelopes with ordered
# change arrays and parallel columnnames/columnvalues text arrays —
# cdc/wal2json.py normalizes them with pure JVM built-ins (posexplode
# ordinal folded into the LSN for intra-transaction order, per-field
# try_cast for checked text->type). Fixture: events paired into
# 2-change transactions (txn = event_id div 2, changes ordered by
# event_id inside the array), deletes as key-only oldkeys (REPLICA
# IDENTITY DEFAULT). The oracle is the plain LWW replay by event_id —
# which equals (txn, ordinal) order by construction, so a green row
# proves the transaction fold preserves the exact change order.

_WAL2JSON_ORACLE = """
SELECT user_id, value AS last_value
FROM (
  SELECT user_id, value, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
"""


@query("cdc_wal2json_state", oracle=_WAL2JSON_ORACLE,
       tags=("cdc", "wal2json"))
def cdc_wal2json_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from ..cdc.transform import apply_pipeline
    from ..cdc.wal2json import parse_wal2json

    (events,) = load(spark, sf_dir, "events")
    is_del = F.col("event_type") == "error"
    change = F.struct(
        F.when(is_del, "delete")
        .when(F.col("event_id") % 2 == 0, "insert")
        .otherwise("update")
        .alias("kind"),
        F.lit("public").alias("schema"),
        F.lit("events").alias("table"),
        F.when(~is_del, F.array(F.lit("user_id"), F.lit("value")))
        .alias("columnnames"),
        F.when(
            ~is_del,
            F.array(
                F.col("user_id").cast("string"), F.col("value").cast("string")
            ),
        ).alias("columnvalues"),
        F.when(
            is_del,
            F.struct(
                F.array(F.lit("user_id")).alias("keynames"),
                F.array(F.col("user_id").cast("string")).alias("keyvalues"),
            ),
        ).alias("oldkeys"),
    )
    docs = (
        # fan_out (r13): the single test-scale parquet split would run
        # the whole map side (struct build + partial collect_list) on
        # one core; this path is pure JVM codegen, where spreading the
        # scan has none of the Python-worker task tax that made fan_out
        # a REGRESSION on the Arrow-encode fixtures (OPTIMIZATION_r13
        # "CDC family"). No-op at scale (enough input splits already).
        fan_out(events).select(
            (F.col("event_id") / 2).cast("long").alias("txn"),
            F.struct(F.col("event_id").alias("o"), change.alias("c")).alias("oc"),
        )
        .groupBy("txn")
        .agg(
            F.to_json(
                F.struct(
                    F.col("txn").cast("string").alias("lsn"),
                    F.transform(
                        F.array_sort(F.collect_list("oc")), lambda x: x["c"]
                    ).alias("change"),
                )
            ).alias("value")
        )
        .select("value")
    )
    row_schema = StructType(
        [StructField("user_id", LongType()), StructField("value", DoubleType())]
    )
    changes = apply_pipeline(parse_wal2json(docs, row_schema))
    state = latest_state(changes, keys=["user_id"], order_by=["lsn"], op_col="op")
    return state.select(
        "user_id", F.col("value").alias("last_value")
    ).orderBy("user_id")


# --- wal2json format_version=2, driven through the oracle gate ----------------
# The layout modern wal2json deployments run (r12 verdict's last CDC
# wire-format gap): ONE JSON object per change — action I/U/D plus B/C
# control frames — each with its own top-level hex pg_lsn, and row
# images as {"name","type","value"} column objects whose values are
# TYPED JSON (numbers unquoted), not v1's all-text parallel arrays.
# Fixture: every event rendered as its own change object with
# lsn "0/<hex(event_id+1)>" (lowercase hex on even ids — exercising the
# case normalization), deletes as identity-only objects (REPLICA
# IDENTITY DEFAULT), plus interleaved B/C frames that the control
# filter must drop. The values are embedded as RAW JSON NUMBERS
# (format_string, no quotes), so a green row proves the typed-JSON ->
# string -> try_cast path round-trips doubles exactly (Java shortest
# round-trip rendering on both ends). The oracle is the plain LWW
# replay by event_id — equal to lsn order since the hex halves are
# zero-padded separately.

_WAL2JSON_V2_ORACLE = """
SELECT user_id, value AS last_value
FROM (
  SELECT user_id, value, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
"""


@query("cdc_wal2json_v2_state", oracle=_WAL2JSON_V2_ORACLE,
       tags=("cdc", "wal2json"))
def cdc_wal2json_v2_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from ..cdc.transform import apply_pipeline
    from ..cdc.wal2json import parse_wal2json_v2

    (events,) = load(spark, sf_dir, "events")
    is_del = F.col("event_type") == "error"
    hexlsn = F.when(
        F.col("event_id") % 2 == 0,
        F.lower(F.hex(F.col("event_id") + 1)),
    ).otherwise(F.hex(F.col("event_id") + 1))
    action = (
        F.when(is_del, "D")
        .when(F.col("event_id") % 2 == 0, "I")
        .otherwise("U")
    )
    # raw JSON NUMBERS in the wire text (no quotes): double -> string is
    # Java shortest-round-trip on the encode side, try_cast exact on the
    # decode side, so values compare bit-identical to the parquet input
    data_obj = F.format_string(
        '{"action":"%s","schema":"public","table":"events","lsn":"0/%s",'
        '%s:[{"name":"user_id","type":"bigint","value":%s}'
        '%s]}',
        action,
        hexlsn,
        F.when(is_del, '"identity"').otherwise('"columns"'),
        F.col("user_id").cast("string"),
        F.when(
            is_del, F.lit("")
        ).otherwise(
            F.format_string(
                ',{"name":"value","type":"double precision","value":%s}',
                F.col("value").cast("string"),
            )
        ),
    )
    # every 7th event drags a begin/commit control pair along — the
    # filter must drop them without disturbing data-row order.
    # repartition BEFORE the encode: a real v2 stream arrives as many
    # files/splits, but the single test parquet file reads as ONE input
    # partition, which would serialize the whole encode+parse into one
    # task (v1 parallelizes for free via its transaction groupBy
    # shuffle). numPartitions is EXPLICIT: a column-only repartition of
    # a test-scale input is coalesced back to one partition by AQE,
    # which re-serializes the parse.
    # explode_outer, NOT explode (r13): explode makes Catalyst infer a
    # `size(objs) > 0` filter and push it below the repartition, where
    # it re-evaluates the ENTIRE encode expression per row on the single
    # input split just to discard the result (the encode then runs a
    # second time above the exchange) — the plan showed the fat
    # format_string tree twice, once in a serial Filter. The arrays here
    # are never empty (every branch yields >= 1 element), so
    # explode_outer is row-for-row identical and infers no filter.
    lines = events.repartition(32, F.col("event_id")).select(
        F.when(
            F.col("event_id") % 7 == 3,
            F.array(
                F.format_string('{"action":"B","lsn":"0/%s"}', hexlsn),
                data_obj,
                F.format_string('{"action":"C","lsn":"0/%s"}', hexlsn),
            ),
        )
        .otherwise(F.array(data_obj))
        .alias("objs")
    ).select(F.explode_outer("objs").alias("value"))
    row_schema = StructType(
        [StructField("user_id", LongType()), StructField("value", DoubleType())]
    )
    changes = apply_pipeline(parse_wal2json_v2(lines, row_schema))
    state = latest_state(changes, keys=["user_id"], order_by=["lsn"], op_col="op")
    return state.select(
        "user_id", F.col("value").alias("last_value")
    ).orderBy("user_id")


# --- wal2json v2 REPLICA IDENTITY key-change routing, oracle-gated -------------
# The v2 twin of cdc_replica_identity_state (pgoutput 'K'/'O' old
# tuples): wal2json v2 ships the OLD KEY as the `identity` array on
# key-changing updates, and split_key_updates must retire the old key
# (DELETE at lsn/0) and land the new image (INSERT at lsn/1) — the
# stale-ghost-row defense, driver-gated on the NEW adapter's identity
# path rather than pytest alone. Fixture: every 5th non-error event
# migrates its key uid -> uid+100000 (identity carries the old uid);
# same dict-model oracle as the pgoutput twin (ord = event_id*2 for the
# retire row, *2+1 for the landing row — exactly the /0 < /1 sub-lsn
# order the splitter emits).

_W2J_V2_RI_ORACLE = """
WITH log AS (
  SELECT user_id AS k, value AS v, event_id * 2 + 1 AS ord,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'I' END AS op
  FROM events
  WHERE NOT (event_type <> 'error' AND event_id % 5 = 3)
  UNION ALL
  SELECT user_id AS k, NULL AS v, event_id * 2 AS ord, 'D' AS op
  FROM events WHERE event_type <> 'error' AND event_id % 5 = 3
  UNION ALL
  SELECT user_id + 100000 AS k, value AS v, event_id * 2 + 1 AS ord, 'I' AS op
  FROM events WHERE event_type <> 'error' AND event_id % 5 = 3
)
SELECT k AS user_id, v AS last_value
FROM (
  SELECT k, v, op, ROW_NUMBER() OVER (PARTITION BY k ORDER BY ord DESC) AS rn
  FROM log
) WHERE rn = 1 AND op <> 'D'
ORDER BY user_id
"""


@query("cdc_wal2json_v2_keyroute_state", oracle=_W2J_V2_RI_ORACLE,
       tags=("cdc", "wal2json", "replica-identity"))
def cdc_wal2json_v2_keyroute_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from ..cdc.transform import apply_pipeline, split_key_updates
    from ..cdc.wal2json import parse_wal2json_v2

    (events,) = load(spark, sf_dir, "events")
    is_del = F.col("event_type") == "error"
    is_mig = ~is_del & (F.col("event_id") % 5 == 3)
    hexlsn = F.hex(F.col("event_id") + 1)
    new_uid = F.when(
        is_mig, F.col("user_id") + 100000).otherwise(F.col("user_id"))
    cols = F.format_string(
        '[{"name":"user_id","type":"bigint","value":%s},'
        '{"name":"value","type":"double precision","value":%s}]',
        new_uid.cast("string"),
        F.col("value").cast("string"),
    )
    ident = F.format_string(
        '[{"name":"user_id","type":"bigint","value":%s}]',
        F.col("user_id").cast("string"),
    )
    obj = F.when(
        is_del,
        F.format_string(
            '{"action":"D","schema":"public","table":"events",'
            '"lsn":"0/%s","identity":%s}', hexlsn, ident),
    ).when(
        is_mig,
        # key-changing UPDATE: identity = old key (REPLICA IDENTITY)
        F.format_string(
            '{"action":"U","schema":"public","table":"events",'
            '"lsn":"0/%s","columns":%s,"identity":%s}', hexlsn, cols, ident),
    ).otherwise(
        F.format_string(
            '{"action":"U","schema":"public","table":"events",'
            '"lsn":"0/%s","columns":%s}', hexlsn, cols),
    )
    # same pre-encode repartition rationale as cdc_wal2json_v2_state
    # (the single test file would serialize encode+parse into one task)
    lines = events.repartition(32, F.col("event_id")).select(
        obj.alias("value"))
    row_schema = StructType(
        [StructField("user_id", LongType()), StructField("value", DoubleType())]
    )
    env = split_key_updates(
        parse_wal2json_v2(lines, row_schema), keys=["user_id"])
    changes = apply_pipeline(env)
    state = latest_state(changes, keys=["user_id"], order_by=["lsn"], op_col="op")
    return state.select(
        "user_id", F.col("value").alias("last_value")
    ).orderBy("user_id")


# --- unchanged-TOAST carry-forward, driven through the oracle gate ------------
# Postgres does NOT re-send a TOASTed value an UPDATE didn't touch: the
# pgoutput tuple carries kind 'u' instead of the bytes. A pipeline that
# upserts decoded images verbatim silently NULLs those columns — the
# classic TOAST data-loss bug, and the reference inherits it (its mapper
# forwards images verbatim, src/mapping/customMapper.ts:19-23). This
# query drives the full defense end-to-end under the driver gate:
# events re-encoded as binary pgoutput where
#   - deletes are key-only ('K' old tuple, REPLICA IDENTITY DEFAULT),
#   - inserts carry the full row,
#   - updates with event_id%3==1 mark `value` unchanged-TOAST ('u'),
#   - updates with event_id%7==2 set `value` to a GENUINE SQL NULL ('n')
#     — the case that proves 'u' and 'n' are never conflated,
# then decode_pgoutput(track_unchanged=True) surfaces the marker column
# and upsert.toast_state carries the last wire-carried value forward
# (one groupBy, map-side combinable — see its docstring for why not a
# window). The oracle computes the same carry-forward via
# last-carried-event-id + self-join, which keeps genuine NULLs (DuckDB's
# arg_max would skip a NULL arg, so it cannot express this directly).

_TOAST_ORACLE = """
WITH log AS (
  SELECT user_id, event_id,
         event_type = 'error' AS is_del,
         (event_type <> 'error')
         AND NOT (event_id % 2 <> 0 AND event_id % 3 = 1) AS carried,
         CASE WHEN event_id % 2 <> 0 AND event_id % 7 = 2 THEN NULL
              ELSE value END AS wire_value
  FROM events
),
last AS (
  SELECT user_id,
         MAX(event_id) FILTER (WHERE carried) AS last_carried_eid,
         arg_max(is_del, event_id) AS last_is_del
  FROM log GROUP BY user_id
)
SELECT l.user_id, lg.wire_value AS last_value
FROM last l
LEFT JOIN log lg
  ON lg.user_id = l.user_id AND lg.event_id = l.last_carried_eid
WHERE NOT l.last_is_del
ORDER BY l.user_id
"""


def toast_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The encoded unchanged-TOAST capture fixture (relation + row
    frames with 'u' TOAST kinds), localCheckpoint-materialized. Factored
    out of cdc_toast_upsert_state (r11, VERDICT r10 item 2) so bench.py
    times fixture encode apart from the decode + carry-forward path —
    and so the relation-discovery and decode passes both read BYTES
    instead of each re-running the Arrow encoder."""
    from pyspark.sql.functions import pandas_udf

    from ..cdc.pgoutput import encode_relation

    (events,) = load(spark, sf_dir, "events")

    @pandas_udf("binary")
    def enc(event_id: pd.Series, user_id: pd.Series, value: pd.Series,
            etype: pd.Series) -> pd.Series:
        from ..cdc.pgoutput import (
            UNCHANGED_TOAST, encode_delete, encode_insert, encode_update)

        out = []
        for eid, uid, val, et in zip(event_id, user_id, value, etype):
            eid = int(eid)
            if et == "error":
                # key-only delete: 'K' tuple, non-key column is 'n'
                out.append(encode_delete(1, [int(uid), None], old_kind=b"K"))
            elif eid % 2 == 0:
                out.append(encode_insert(1, [int(uid), repr(float(val))]))
            elif eid % 3 == 1:
                out.append(encode_update(1, [int(uid), UNCHANGED_TOAST]))
            elif eid % 7 == 2:
                out.append(encode_update(1, [int(uid), None]))
            else:
                out.append(encode_update(1, [int(uid), repr(float(val))]))
        return pd.Series(out)

    rel = spark.createDataFrame(
        [(0, bytearray(encode_relation(1, "public", "events",
                                       ["user_id", "value"])))],
        "lsn long, payload binary",
    )
    msgs = rel.unionByName(
        events.select(
            (F.col("event_id") + 1).alias("lsn"),
            enc("event_id", "user_id", "value", "event_type").alias("payload"),
        )
    )
    return pin_capture(msgs)


@query("cdc_toast_upsert_state", oracle=_TOAST_ORACLE,
       tags=("cdc", "pgoutput", "toast"))
def cdc_toast_upsert_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from ..cdc.pgoutput import decode_pgoutput
    from ..cdc.transform import extract_images, filter_control_messages

    msgs = toast_capture(spark, sf_dir)
    row_schema = StructType(
        [StructField("user_id", LongType()), StructField("value", DoubleType())]
    )
    decoded = decode_pgoutput(msgs, row_schema, track_unchanged=True)
    changes = (
        decoded.transform(filter_control_messages)
        .transform(extract_images)
        .select("lsn", "op", "unchanged", "image.*")
    )
    from ..cdc.upsert import toast_state

    state = toast_state(
        changes, keys=["user_id"], order_by=["lsn"], toast_cols=["value"]
    )
    return state.select(
        "user_id", F.col("value").alias("last_value")
    ).orderBy("user_id")


# --- changelog integrity audit (LSN gaps / duplicates / max stall) ------------
# The operational pre-flight every CDC consumer runs before trusting a
# replay: per stream key, did the LSN sequence arrive dense and unique?
# The reference acks offsets with no such check (ack-before-send window,
# src/database/postgresql/PostgresOperation.ts:24-29) — a silently
# skipped LSN is exactly the failure this surfaces. Fixture semantics:
# event_id is the LSN analogue and each user_id is a slot/partition
# analogue; REAL deliveries would use (slot, lsn). Per key:
#   n_changes, n_distinct (duplicates = n - n_distinct), span-vs-count
#   missing count, and the largest inter-LSN gap (max lead-lag step - 1).
# Scale shape: one window per key for the step (single hash shuffle on
# the key — the same partitioning the downstream upsert needs anyway,
# so at 100 TB this audit rides the existing shuffle), folded by the
# same groupBy. Gap arithmetic is integer-exact, so it hash-checks.

_GAP_ORACLE = """
WITH step AS (
  SELECT user_id, event_id,
         event_id - LAG(event_id) OVER (PARTITION BY user_id
                                        ORDER BY event_id) AS d
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_changes,
       CAST(COUNT(*) - COUNT(CASE WHEN d = 0 THEN 1 END) AS BIGINT)
         AS n_distinct,
       CAST(MAX(event_id) - MIN(event_id) + 1
            - (COUNT(*) - COUNT(CASE WHEN d = 0 THEN 1 END))
            AS BIGINT) AS n_missing,
       CAST(COALESCE(MAX(d) - 1, 0) AS BIGINT) AS largest_gap
FROM step
GROUP BY user_id
ORDER BY user_id
"""


@query("cdc_lsn_gap_audit", oracle=_GAP_ORACLE,
       tags=("cdc", "diagnostics", "audit"))
def cdc_lsn_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    step = events.select(
        "user_id",
        "event_id",
        (F.col("event_id") - F.lag("event_id").over(w)).alias("d"),
    )
    # distinct via ADJACENCY, not countDistinct: the window already sorted
    # each key by event_id, so a duplicate LSN is exactly an adjacent pair
    # with step d == 0 — n_distinct = n - count(d = 0). countDistinct would
    # add a second Exchange (partial-distinct expand on (key, lsn)); this
    # keeps the whole audit on the window's single shuffle (verified: one
    # Exchange in the executed plan).
    n_dupes = F.count(F.when(F.col("d") == 0, 1))
    n_distinct = F.count(F.lit(1)) - n_dupes
    return (
        step.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_changes"),
            n_distinct.cast("long").alias("n_distinct"),
            (F.max("event_id") - F.min("event_id") + 1 - n_distinct)
            .cast("long").alias("n_missing"),
            F.coalesce(F.max("d") - 1, F.lit(0)).cast("long")
            .alias("largest_gap"),
        )
        .orderBy("user_id")
    )


# --- pgoutput protocol v2 (streamed transactions), driven through the gate ----
# Postgres 14+ streams LARGE transactions before commit: segments of
# xid-prefixed row messages bounded by S/E frames, applied only at
# StreamCommit (in COMMIT order, which differs from wire order) and
# discarded on StreamAbort. Fixture: events grouped into 4-change
# transactions (txn = event_id div 4); odd txns are streamed, with the
# commit lsn SHIFTED forward by 40*(txn%3) so commit order genuinely
# crosses later wire traffic; streamed txns with txn%11==3 abort (their
# changes must vanish). The engine path is the full Spark decomposition:
# byte-filtered segment pairing -> binned-interval-join membership
# (operators/rangejoin) -> xid-stripping Arrow decode -> broadcast
# verdict join -> APPLY/ORIGINAL envelope order -> the UNCHANGED v1
# pipeline + upsert. The oracle replays the same apply-order rule in
# SQL, so a green row proves commit-order application, abort discard,
# and the reorder arithmetic all at once.

_PGOUT_V2_ORACLE = """
WITH e AS (
  SELECT event_id, user_id, value, event_type,
         event_id // 4 AS txn
  FROM events
),
t AS (
  SELECT *, MAX(event_id) OVER (PARTITION BY txn) AS mx FROM e
),
f AS (
  SELECT user_id, value, event_type,
         CASE WHEN txn % 2 = 1
              THEN mx * 10 + 7 + 40 * (txn % 3)
              ELSE event_id * 10 END AS apply_lsn,
         event_id * 10 AS orig,
         (txn % 2 = 1 AND txn % 11 = 3) AS aborted
  FROM t
)
SELECT user_id, value AS last_value
FROM (
  SELECT user_id, value, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY apply_lsn DESC, orig DESC) AS rn
  FROM f WHERE NOT aborted
) WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
"""


def pgoutput_stream_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The encoded protocol-v2 capture fixture (relation + row frames +
    S/E/c/A stream-control frames), localCheckpoint-materialized.
    Factored out of cdc_pgoutput_stream_state (r11, VERDICT r10 item 2)
    so bench.py can time FIXTURE MATERIALIZATION apart from the
    decode/apply path it feeds — fixture-encode drift must not
    masquerade as cdc-family engine drift."""
    from pyspark.sql.functions import pandas_udf

    from ..cdc.pgoutput import encode_relation

    (events,) = load(spark, sf_dir, "events")
    e = events.select(
        "event_id", "user_id", "value", "event_type",
        F.expr("event_id div 4").alias("txn"),
    )

    @pandas_udf("binary")
    def enc_row(event_id: pd.Series, user_id: pd.Series, value: pd.Series,
                etype: pd.Series, txn: pd.Series) -> pd.Series:
        from ..cdc.pgoutput import (
            encode_delete, encode_insert, encode_update, stream_wrap)

        out = []
        for eid, uid, val, et, tx in zip(event_id, user_id, value, etype, txn):
            eid, tx = int(eid), int(tx)
            if et == "error":
                msg = encode_delete(1, [int(uid), None], old_kind=b"K")
            elif eid % 3 == 0:
                msg = encode_insert(1, [int(uid), repr(float(val))])
            else:
                msg = encode_update(1, [int(uid), repr(float(val))])
            out.append(stream_wrap(tx, msg) if tx % 2 == 1 else msg)
        return pd.Series(out)

    rows = e.select(
        (F.col("event_id") * 10).alias("lsn"),
        enc_row("event_id", "user_id", "value", "event_type", "txn")
        .alias("payload"),
    )

    seg = (
        e.filter(F.col("txn") % 2 == 1)
        .groupBy("txn")
        .agg(F.min("event_id").alias("mn"), F.max("event_id").alias("mx"))
    )

    @pandas_udf("binary")
    def enc_ctrl(kind: pd.Series, txn: pd.Series,
                 commit_lsn: pd.Series) -> pd.Series:
        from ..cdc.pgoutput import (
            encode_stream_abort, encode_stream_commit, encode_stream_start,
            encode_stream_stop)

        out = []
        for k, tx, cl in zip(kind, txn, commit_lsn):
            tx = int(tx)
            if k == "S":
                out.append(encode_stream_start(tx))
            elif k == "E":
                out.append(encode_stream_stop())
            elif k == "c":
                out.append(encode_stream_commit(tx, int(cl), int(cl) + 1, 0))
            else:
                out.append(encode_stream_abort(tx, tx))
        return pd.Series(out)

    aborted = F.col("txn") % 11 == 3
    commit_lsn = F.col("mx") * 10 + 7 + 40 * (F.col("txn") % 3)
    starts = seg.select(
        (F.col("mn") * 10 - 5).alias("lsn"),
        enc_ctrl(F.lit("S"), "txn", F.lit(0)).alias("payload"),
    )
    stops = seg.select(
        (F.col("mx") * 10 + 1).alias("lsn"),
        enc_ctrl(F.lit("E"), "txn", F.lit(0)).alias("payload"),
    )
    verdict_rows = seg.select(
        (F.col("mx") * 10 + 9).alias("lsn"),
        enc_ctrl(
            F.when(aborted, "A").otherwise("c"), "txn", commit_lsn
        ).alias("payload"),
    )
    rel = spark.createDataFrame(
        [(0, bytearray(encode_relation(1, "public", "events",
                                       ["user_id", "value"])))],
        "lsn long, payload binary",
    )
    msgs = rel.unionByName(rows).unionByName(starts).unionByName(stops) \
              .unionByName(verdict_rows)
    # The capture REALLY is bytes in storage read by four passes
    # (relation discovery, segment pairing, membership join, verdicts);
    # without materialization each pass would re-run the fixture's Arrow
    # ENCODER, timing the fixture 4x instead of the decode path.
    return pin_capture(msgs)


@query("cdc_pgoutput_stream_state", oracle=_PGOUT_V2_ORACLE,
       tags=("cdc", "pgoutput", "streaming-txn"))
def cdc_pgoutput_stream_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from ..cdc.pgoutput import (
        apply_stream_transactions, decode_pgoutput_v2, stream_verdicts)
    from ..cdc.transform import apply_pipeline

    msgs = pgoutput_stream_capture(spark, sf_dir)
    row_schema = StructType(
        [StructField("user_id", LongType()), StructField("value", DoubleType())]
    )
    decoded = decode_pgoutput_v2(msgs, row_schema, bin_width=64)
    env = apply_stream_transactions(decoded, stream_verdicts(msgs))
    changes = apply_pipeline(env)
    state = latest_state(changes, keys=["user_id"], order_by=["lsn"], op_col="op")
    return state.select(
        "user_id", F.col("value").alias("last_value")
    ).orderBy("user_id")


# --- multi-table capture routed bronze -> silver, driven through the gate -----
# One replication slot, TWO tables interleaved in the same byte stream
# (events as relid 1, orders as relid 2 — orders get an insert AND a
# later halved-price update each, so the routed LWW is non-trivial).
# The engine decodes the slot ONCE into the schema-agnostic bronze
# envelope (decode_pgoutput_generic: the only Python pass), materializes
# it (the landing the bronze layer exists for), then routes both silver
# tables with pure-JVM element_at + try_cast typing (route_table) into
# the standard pipeline + upsert. The oracle replays both tables' LWW
# and unions them, so one green row hash-checks the relid routing, the
# codegen typing, and both states.

_MULTI_ORACLE = """
SELECT 'events' AS tbl, user_id AS k, value AS last_value
FROM (
  SELECT user_id, value, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
UNION ALL
SELECT 'orders' AS tbl, o_orderkey AS k, o_totalprice / 2 AS last_value
FROM orders
ORDER BY tbl, k
"""


@query("cdc_multitable_route_state", oracle=_MULTI_ORACLE,
       tags=("cdc", "pgoutput", "multitable"))
def cdc_multitable_route_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from ..cdc.pgoutput import (
        decode_pgoutput_generic, encode_relation, route_table)
    from ..cdc.transform import apply_pipeline

    (events, orders) = load(spark, sf_dir, "events", "orders")

    @pandas_udf("binary")
    def enc_event(event_id: pd.Series, user_id: pd.Series, value: pd.Series,
                  etype: pd.Series) -> pd.Series:
        from ..cdc.pgoutput import encode_delete, encode_insert, encode_update

        out = []
        for eid, uid, val, et in zip(event_id, user_id, value, etype):
            if et == "error":
                out.append(encode_delete(1, [int(uid), None], old_kind=b"K"))
            elif int(eid) % 3 == 0:
                out.append(encode_insert(1, [int(uid), repr(float(val))]))
            else:
                out.append(encode_update(1, [int(uid), repr(float(val))]))
        return pd.Series(out)

    @pandas_udf("binary")
    def enc_order(okey: pd.Series, price: pd.Series,
                  kind: pd.Series) -> pd.Series:
        from ..cdc.pgoutput import encode_insert, encode_update

        out = []
        for k, p, knd in zip(okey, price, kind):
            if knd == "I":
                out.append(encode_insert(2, [int(k), repr(float(p))]))
            else:
                out.append(encode_update(2, [int(k), repr(float(p) / 2)]))
        return pd.Series(out)

    rels = spark.createDataFrame(
        [
            (0, bytearray(encode_relation(1, "public", "events",
                                          ["user_id", "value"]))),
            (2, bytearray(encode_relation(2, "public", "orders",
                                          ["o_orderkey", "o_totalprice"]))),
        ],
        "lsn long, payload binary",
    )
    ev_rows = events.select(
        (F.col("event_id") * 4).alias("lsn"),
        enc_event("event_id", "user_id", "value", "event_type")
        .alias("payload"),
    )
    ord_ins = orders.select(
        (F.col("o_orderkey") * 4 + 1).alias("lsn"),
        enc_order("o_orderkey", "o_totalprice", F.lit("I")).alias("payload"),
    )
    ord_upd = orders.select(
        (F.col("o_orderkey") * 4 + 3).alias("lsn"),
        enc_order("o_orderkey", "o_totalprice", F.lit("U")).alias("payload"),
    )
    msgs = rels.unionByName(ev_rows).unionByName(ord_ins).unionByName(ord_upd)

    relations = {1: ["user_id", "value"], 2: ["o_orderkey", "o_totalprice"]}
    # bronze lands once; both silver tables route from the SAME pass
    bronze = pin_capture(decode_pgoutput_generic(msgs, relations))

    ev_schema = StructType([StructField("user_id", LongType()),
                            StructField("value", DoubleType())])
    ord_schema = StructType([StructField("o_orderkey", LongType()),
                             StructField("o_totalprice", DoubleType())])
    ev_state = latest_state(
        apply_pipeline(route_table(bronze, 1, relations[1], ev_schema)),
        keys=["user_id"], order_by=["lsn"], op_col="op",
    ).select(
        F.lit("events").alias("tbl"),
        F.col("user_id").alias("k"),
        F.col("value").alias("last_value"),
    )
    ord_state = latest_state(
        apply_pipeline(route_table(bronze, 2, relations[2], ord_schema)),
        keys=["o_orderkey"], order_by=["lsn"], op_col="op",
    ).select(
        F.lit("orders").alias("tbl"),
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("last_value"),
    )
    return ev_state.unionByName(ord_state).orderBy("tbl", "k")


# --- REPLICA IDENTITY routing of key-changing UPDATEs -------------------------
# An UPDATE that MOVES a row to a different key ships an old image
# (key-only under REPLICA IDENTITY DEFAULT, pgoutput old kind 'K'; the
# full row under FULL, kind 'O'). A consumer that upserts only the new
# image leaves a stale ghost row at the old key forever — the reference
# does exactly that (Option(new), old ignored on updates,
# src/mapping/customMapper.ts:19-23). transform.split_key_updates routes
# such an update as DELETE(old key) + INSERT(new image) at sub-ordinal
# lsns. Fixture: events keyed by user_id; event_id%5==3 non-error events
# become key migrations user_id -> user_id+100000 (DEFAULT and FULL
# alternating by event_id%2, exercising both wire shapes), error events
# are key-only deletes, the rest plain inserts/updates. The oracle
# replays the SPLIT changelog (2 rows per migration at ordinals 2*eid
# and 2*eid+1) with window LWW — so a green row proves the split, the
# sub-ordinal ordering, and both old-image decodes end-to-end.

_RI_ORACLE = """
WITH log AS (
  SELECT user_id AS k, value AS v, event_id * 2 + 1 AS ord,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'I' END AS op
  FROM events
  WHERE NOT (event_type <> 'error' AND event_id % 5 = 3)
  UNION ALL
  SELECT user_id AS k, NULL AS v, event_id * 2 AS ord, 'D' AS op
  FROM events WHERE event_type <> 'error' AND event_id % 5 = 3
  UNION ALL
  SELECT user_id + 100000 AS k, value AS v, event_id * 2 + 1 AS ord, 'I' AS op
  FROM events WHERE event_type <> 'error' AND event_id % 5 = 3
)
SELECT k AS user_id, v AS last_value
FROM (
  SELECT k, v, op, ROW_NUMBER() OVER (PARTITION BY k ORDER BY ord DESC) AS rn
  FROM log
) WHERE rn = 1 AND op <> 'D'
ORDER BY user_id
"""


@query("cdc_replica_identity_state", oracle=_RI_ORACLE,
       tags=("cdc", "pgoutput", "replica-identity"))
def cdc_replica_identity_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from ..cdc.pgoutput import decode_pgoutput, encode_relation
    from ..cdc.transform import apply_pipeline, split_key_updates

    (events,) = load(spark, sf_dir, "events")

    @pandas_udf("binary")
    def enc(event_id: pd.Series, user_id: pd.Series, value: pd.Series,
            etype: pd.Series) -> pd.Series:
        from ..cdc.pgoutput import (
            encode_delete, encode_insert, encode_update)

        out = []
        for eid, uid, val, et in zip(event_id, user_id, value, etype):
            eid, uid = int(eid), int(uid)
            v = repr(float(val))
            if et == "error":
                # key-only delete (REPLICA IDENTITY DEFAULT)
                out.append(encode_delete(1, [uid, None], old_kind=b"K"))
            elif eid % 5 == 3:
                # key migration: uid -> uid+100000, both identity modes
                if eid % 2 == 0:   # DEFAULT: key-only old image
                    out.append(encode_update(
                        1, [uid + 100000, v],
                        old_values=[uid, None], old_kind=b"K"))
                else:              # FULL: full old image
                    out.append(encode_update(
                        1, [uid + 100000, v],
                        old_values=[uid, v], old_kind=b"O"))
            elif eid % 3 == 0:
                out.append(encode_insert(1, [uid, v]))
            else:
                out.append(encode_update(1, [uid, v]))
        return pd.Series(out)

    rel = spark.createDataFrame(
        [(0, bytearray(encode_relation(1, "public", "events",
                                       ["user_id", "value"])))],
        "lsn long, payload binary",
    )
    msgs = rel.unionByName(
        events.select(
            (F.col("event_id") + 1).alias("lsn"),
            enc("event_id", "user_id", "value", "event_type").alias("payload"),
        )
    )
    row_schema = StructType(
        [StructField("user_id", LongType()), StructField("value", DoubleType())]
    )
    # relations passed explicitly (the fixture defines them): the bounded
    # 'R'-discovery collect is cdc_pgoutput_state's driver-gated claim,
    # and skipping it keeps this build job-free (test_plans discipline)
    env = split_key_updates(
        decode_pgoutput(msgs, row_schema,
                        relations={1: ["user_id", "value"]}),
        keys=["user_id"],
    )
    changes = apply_pipeline(env)
    state = latest_state(changes, keys=["user_id"], order_by=["lsn"], op_col="op")
    return state.select(
        "user_id", F.col("value").alias("last_value")
    ).orderBy("user_id")


# --- the whole engine in ONE plan: CDC -> analytics showcase ------------------
# Binary pgoutput decode -> unchanged-TOAST carry-forward -> SCD2
# version history -> point-in-time join -> exact-decimal revenue rollup,
# composed as a single lazy DataFrame the driver hash-checks end-to-end.
# Scenario: a user "rate" profile is CDC-fed (every 3rd event is a rate
# change; every 5th rate change doesn't re-send the TOASTed rate; error
# events delete the profile), and purchases (the other events) must be
# priced at the rate that was valid AT their position in the log — the
# canonical "reprice facts against a slowly changing dimension" job.
# Plan shape at 100 TB: one Arrow decode pass (the only Python), one
# window pair per user for carry + versioning (hash shuffle on user_id),
# then a plain HASH join (equi on user_id, validity range as residual)
# into a partial-agg rollup. Deletes genuinely shape validity: a
# purchase between a profile delete and the next insert matches no
# version and drops from the rollup.

_E2E_ORACLE = """
WITH chg AS (
  SELECT user_id, event_id + 1 AS ord,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         CASE WHEN event_type <> 'error' AND event_id % 5 <> 2
              THEN value END AS wire_rate
  FROM events WHERE event_id % 3 = 0
),
filled AS (
  SELECT user_id, ord, op,
         LAST_VALUE(wire_rate IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ord
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rate
  FROM chg
),
versions AS (
  SELECT * FROM (
    SELECT user_id, rate, op, ord AS valid_from,
           LEAD(ord) OVER (PARTITION BY user_id ORDER BY ord) AS valid_to
    FROM filled
  ) WHERE op <> 'D'
),
facts AS (
  SELECT user_id, event_id + 1 AS ord, value, event_type
  FROM events WHERE event_id % 3 <> 0 AND event_type <> 'error'
)
SELECT f.event_type,
       CAST(SUM(CAST(f.value * v.rate AS DECIMAL(28,8))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_facts
FROM facts f
JOIN versions v
  ON v.user_id = f.user_id
 AND v.valid_from <= f.ord
 AND (v.valid_to IS NULL OR f.ord < v.valid_to)
GROUP BY f.event_type
ORDER BY f.event_type
"""


def e2e_revenue_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The encoded rate-changelog capture fixture for the showcase query
    (row frames only — the decode gets its relation map explicitly),
    localCheckpoint-materialized. Factored out of cdc_e2e_revenue_rollup
    (r11, VERDICT r10 item 2) so bench.py times the fixture encode apart
    from the decode -> TOAST carry -> SCD2 -> PIT-join -> rollup path."""
    from pyspark.sql.functions import pandas_udf

    (events,) = load(spark, sf_dir, "events")

    # the CDC feed, as real pgoutput BYTES (rate changes only)
    @pandas_udf("binary")
    def enc(event_id: pd.Series, user_id: pd.Series,
            value: pd.Series, etype: pd.Series) -> pd.Series:
        from ..cdc.pgoutput import (
            UNCHANGED_TOAST, encode_delete, encode_insert, encode_update)

        out = []
        for eid, uid, val, et in zip(event_id, user_id, value, etype):
            eid, uid = int(eid), int(uid)
            if et == "error":
                out.append(encode_delete(1, [uid, None], old_kind=b"K"))
            elif eid % 5 == 2:  # TOASTed rate not re-sent
                out.append(encode_update(1, [uid, UNCHANGED_TOAST]))
            elif eid % 2 == 0:
                out.append(encode_insert(1, [uid, repr(float(val))]))
            else:
                out.append(encode_update(1, [uid, repr(float(val))]))
        return pd.Series(out)

    msgs = events.filter(F.col("event_id") % 3 == 0).select(
        (F.col("event_id") + 1).alias("lsn"),
        enc("event_id", "user_id", "value", "event_type").alias("payload"),
    )
    return pin_capture(msgs)


@query("cdc_e2e_revenue_rollup", oracle=_E2E_ORACLE,
       tags=("cdc", "pgoutput", "toast", "scd2", "pit", "showcase"))
def cdc_e2e_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from ..cdc.pgoutput import decode_pgoutput
    from ..cdc.transform import extract_images, filter_control_messages
    from ..cdc.upsert import scd2_history

    (events,) = load(spark, sf_dir, "events")
    msgs = e2e_revenue_capture(spark, sf_dir)
    row_schema = StructType(
        [StructField("user_id", LongType()), StructField("rate", DoubleType())]
    )
    env = decode_pgoutput(
        msgs, row_schema, relations={1: ["user_id", "rate"]},
        track_unchanged=True,
    )
    changes = (
        env.transform(filter_control_messages)
        .transform(extract_images)
        .select(
            "lsn", "op", "unchanged",
            F.col("image.user_id").alias("user_id"),
            F.col("image.rate").alias("rate"),
        )
        # back to the numeric log position (lsn is "0/%016X")
        .withColumn(
            "ord", F.conv(F.expr("substring(lsn, 3, 16)"), 16, 10).cast("long")
        )
    )

    # 2. TOAST carry-forward PER VERSION (not just final state): the last
    # wire-carried rate at or before each change, struct-wrapped so a
    # genuine SQL NULL would still carry (same discipline as toast_state)
    carried = (F.col("op") != "D") & ~F.array_contains(
        F.coalesce(F.col("unchanged"), F.array().cast("array<string>")),
        "rate",
    )
    w = (
        Window.partitionBy("user_id").orderBy("ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = changes.withColumn(
        "rate",
        F.last(F.when(carried, F.struct(F.col("rate").alias("v"))), True)
        .over(w)["v"],
    )

    # 3. SCD2: every change becomes a version row [valid_from, valid_to)
    versions = scd2_history(
        filled.select("user_id", "rate", "op", "ord"),
        keys=["user_id"], order_by=["ord"],
    ).select("user_id", "rate", "valid_from", "valid_to")

    # 4. point-in-time join + rollup: equi on user_id (hash join), the
    # validity interval as a residual predicate; exact decimal sum
    facts = events.filter(
        (F.col("event_id") % 3 != 0) & (F.col("event_type") != "error")
    ).select(
        F.col("user_id").alias("f_uid"),
        (F.col("event_id") + 1).alias("f_ord"),
        "value", "event_type",
    )
    pit = facts.join(
        versions,
        (F.col("f_uid") == F.col("user_id"))
        & (F.col("valid_from") <= F.col("f_ord"))
        & (F.col("valid_to").isNull() | (F.col("f_ord") < F.col("valid_to"))),
    )
    return (
        pit.groupBy("event_type")
        .agg(
            F.sum((F.col("value") * F.col("rate")).cast("decimal(28,8)"))
            .cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_facts"),
        )
        .orderBy("event_type")
    )


# --- pgoutput protocol v3 (two-phase commit), driven through the gate ----------
# PREPARE TRANSACTION under logical decoding (PG 15+, two_phase slots):
# a prepared transaction's changes arrive between BeginPrepare ('b') and
# Prepare ('P') as plain v1 row messages, then HOLD until CommitPrepared
# applies them at ITS lsn or RollbackPrepared voids them. Fixture: the
# same 4-change transactions as the v2 query (txn = event_id div 4) but
# odd txns are PREPARED blocks instead of streamed segments — commit
# lsns shifted forward by 40*(txn%3) so prepared-commit order crosses
# later plain traffic; txn%11==3 rolls back. Engine path: v1 decode ->
# prepared_spans (byte-filtered 'b'/'P' pairing) -> binned-interval
# membership -> prepared_verdicts broadcast join ->
# apply_stream_transactions (REUSED unchanged — 2PC is the same
# intervals+verdicts shape as v2) -> pipeline + upsert. The oracle
# replays the identical apply-order rule, so one green row hash-checks
# block membership, commit-order application, and rollback discard.

_PGOUT_2PC_ORACLE = """
WITH e AS (
  SELECT event_id, user_id, value, event_type,
         event_id // 4 AS txn
  FROM events
),
t AS (
  SELECT *, MAX(event_id) OVER (PARTITION BY txn) AS mx FROM e
),
f AS (
  SELECT user_id, value, event_type,
         CASE WHEN txn % 2 = 1
              THEN mx * 10 + 7 + 40 * (txn % 3)
              ELSE event_id * 10 END AS apply_lsn,
         event_id * 10 AS orig,
         (txn % 2 = 1 AND txn % 11 = 3) AS rolled_back
  FROM t
)
SELECT user_id, value AS last_value
FROM (
  SELECT user_id, value, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY apply_lsn DESC, orig DESC) AS rn
  FROM f WHERE NOT rolled_back
) WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
"""


def two_phase_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The encoded 2PC capture fixture (relation + row frames + b/P/K/r
    control frames), localCheckpoint-materialized. Factored out of
    cdc_two_phase_state so bench.py can time FIXTURE MATERIALIZATION
    separately from the decode/apply path it feeds — the fixture encode
    is test scaffolding, not engine work, and reporting it apart keeps
    the cdc family subtotal comparable across rounds."""
    from pyspark.sql.functions import pandas_udf

    from ..cdc.pgoutput import encode_relation

    (events,) = load(spark, sf_dir, "events")
    e = events.select(
        "event_id", "user_id", "value", "event_type",
        F.expr("event_id div 4").alias("txn"),
    )

    @pandas_udf("binary")
    def enc_row(event_id: pd.Series, user_id: pd.Series, value: pd.Series,
                etype: pd.Series) -> pd.Series:
        from ..cdc.pgoutput import (
            encode_delete, encode_insert, encode_update)

        out = []
        for eid, uid, val, et in zip(event_id, user_id, value, etype):
            if et == "error":
                out.append(encode_delete(1, [int(uid), None], old_kind=b"K"))
            elif int(eid) % 3 == 0:
                out.append(encode_insert(1, [int(uid), repr(float(val))]))
            else:
                out.append(encode_update(1, [int(uid), repr(float(val))]))
        return pd.Series(out)

    rows = e.select(
        (F.col("event_id") * 10).alias("lsn"),
        enc_row("event_id", "user_id", "value", "event_type").alias("payload"),
    )

    blk = (
        e.filter(F.col("txn") % 2 == 1)
        .groupBy("txn")
        .agg(F.min("event_id").alias("mn"), F.max("event_id").alias("mx"))
    )

    @pandas_udf("binary")
    def enc_ctrl(kind: pd.Series, txn: pd.Series,
                 lsn_arg: pd.Series) -> pd.Series:
        from ..cdc.pgoutput import (
            encode_begin_prepare, encode_commit_prepared, encode_prepare,
            encode_rollback_prepared)

        out = []
        for k, tx, la in zip(kind, txn, lsn_arg):
            tx, la = int(tx), int(la)
            gid = f"gid{tx}"
            if k == "b":
                out.append(encode_begin_prepare(la, la, 0, tx, gid))
            elif k == "P":
                out.append(encode_prepare(la, la, 0, tx, gid))
            elif k == "K":
                out.append(encode_commit_prepared(la, la + 1, 0, tx, gid))
            else:
                out.append(encode_rollback_prepared(la, la + 1, 0, 0, tx, gid))
        return pd.Series(out)

    rolled = F.col("txn") % 11 == 3
    commit_lsn = F.col("mx") * 10 + 7 + 40 * (F.col("txn") % 3)
    begins = blk.select(
        (F.col("mn") * 10 - 5).alias("lsn"),
        enc_ctrl(F.lit("b"), "txn", F.col("mn") * 10 - 5).alias("payload"),
    )
    prepares = blk.select(
        (F.col("mx") * 10 + 1).alias("lsn"),
        enc_ctrl(F.lit("P"), "txn", F.col("mx") * 10 + 1).alias("payload"),
    )
    verdict_rows = blk.select(
        (F.col("mx") * 10 + 9).alias("lsn"),
        enc_ctrl(
            F.when(rolled, "r").otherwise("K"), "txn", commit_lsn
        ).alias("payload"),
    )
    rel = spark.createDataFrame(
        [(0, bytearray(encode_relation(1, "public", "events",
                                       ["user_id", "value"])))],
        "lsn long, payload binary",
    )
    msgs = rel.unionByName(rows).unionByName(begins).unionByName(prepares) \
              .unionByName(verdict_rows)
    # bytes-in-storage model: three passes (span pairing, membership
    # join, verdicts) read the capture — materialize once or each pass
    # re-runs the fixture's Arrow ENCODER (same rationale as the v2 twin)
    return pin_capture(msgs)


@query("cdc_two_phase_state", oracle=_PGOUT_2PC_ORACLE,
       tags=("cdc", "pgoutput", "two-phase"))
def cdc_two_phase_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from ..cdc.pgoutput import (
        apply_stream_transactions, decode_pgoutput_2pc, prepared_verdicts)
    from ..cdc.transform import apply_pipeline

    msgs = two_phase_capture(spark, sf_dir)

    row_schema = StructType(
        [StructField("user_id", LongType()), StructField("value", DoubleType())]
    )
    decoded = decode_pgoutput_2pc(
        msgs, row_schema, relations={1: ["user_id", "value"]}, bin_width=64)
    env = apply_stream_transactions(decoded, prepared_verdicts(msgs))
    changes = apply_pipeline(env)
    state = latest_state(changes, keys=["user_id"], order_by=["lsn"], op_col="op")
    return state.select(
        "user_id", F.col("value").alias("last_value")
    ).orderBy("user_id")


# --- logical decoding messages ('M'), driven through the gate ------------------
# pg_logical_emit_message() markers (audit trails, deploy fences, cache
# invalidations) ride the SAME slot as row changes; the engine decodes
# their (prefix, content) instead of dropping them as inert control
# rows. Fixture: one marker per event — prefix cycles audit/deploy/mark
# by event_id%3, content is "uid=<user_id>;v=<value>" — interleaved with
# the events' row messages in one capture (markers at odd lsns, rows at
# even), so the byte-filter genuinely separates marker from row traffic.
# The rollup (count + total content bytes + distinct users mentioned,
# per prefix) forces prefix decode, content byte fidelity, AND content
# PARSING to all hash-match.

_MSG_ORACLE = """
SELECT CASE WHEN event_id % 3 = 0 THEN 'audit'
            WHEN event_id % 3 = 1 THEN 'deploy'
            ELSE 'mark' END AS prefix,
       COUNT(*) AS n_msgs,
       CAST(SUM(LENGTH('uid=' || CAST(user_id AS VARCHAR)
                || ';v=' || CAST(CAST(value AS DECIMAL(18,4)) AS VARCHAR)))
            AS BIGINT) AS content_bytes,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY prefix
ORDER BY prefix
"""


@query("cdc_message_audit", oracle=_MSG_ORACLE,
       tags=("cdc", "pgoutput", "message"))
def cdc_message_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from ..cdc.pgoutput import decode_logical_messages

    (events,) = load(spark, sf_dir, "events")

    @pandas_udf("binary")
    def enc(event_id: pd.Series, user_id: pd.Series,
            value: pd.Series) -> pd.Series:
        from decimal import Decimal

        from ..cdc.pgoutput import encode_insert, encode_logical_message

        out = []
        prefixes = ("audit", "deploy", "mark")
        for eid, uid, val in zip(event_id, user_id, value):
            eid = int(eid)
            # DECIMAL(18,4) text on both sides: repr(float) text varies
            # in digit count, decimal text is canonical
            body = f"uid={int(uid)};v={Decimal(str(float(val))).quantize(Decimal('0.0001'))}"
            out.append(encode_logical_message(
                prefixes[eid % 3], body.encode(), lsn=eid))
        return pd.Series(out)

    @pandas_udf("binary")
    def enc_row(user_id: pd.Series, value: pd.Series) -> pd.Series:
        from ..cdc.pgoutput import encode_insert

        return pd.Series([
            encode_insert(1, [int(u), repr(float(v))])
            for u, v in zip(user_id, value)
        ])

    markers = events.select(
        (F.col("event_id") * 2 + 1).alias("lsn"),
        enc("event_id", "user_id", "value").alias("payload"),
    )
    rows = events.select(
        (F.col("event_id") * 2).alias("lsn"),
        enc_row("user_id", "value").alias("payload"),
    )
    msgs = markers.unionByName(rows)
    decoded = decode_logical_messages(msgs)
    parsed = decoded.select(
        "prefix",
        F.length("content").cast("long").alias("clen"),
        F.regexp_extract(F.col("content").cast("string"), r"uid=(\d+);", 1)
        .cast("long").alias("uid"),
    )
    return (
        parsed.groupBy("prefix")
        .agg(
            F.count(F.lit(1)).alias("n_msgs"),
            F.sum("clen").alias("content_bytes"),
            F.countDistinct("uid").cast("long").alias("n_users"),
        )
        .orderBy("prefix")
    )


# --- replication-origin filtering, driven through the gate ---------------------
# Bidirectional topologies tag foreign transactions with an Origin
# message; a subscriber that forwards them back creates the A->B->A
# echo. Fixture: events in 4-change transactions (txn = event_id div 4)
# framed as B .. rows .. C; txn%7==2 carries an Origin tag "nodeB" right
# after Begin — filter_foreign_origins must void exactly those
# transactions' changes before the standard decode -> upsert pipeline.
# The oracle replays LWW with the foreign transactions excluded, so a
# green row proves span construction, origin-name decode, and the
# binned anti join end-to-end.

_ORIGIN_ORACLE = """
SELECT user_id, value AS last_value
FROM (
  SELECT user_id, value, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events WHERE (event_id // 4) % 7 <> 2
) WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
"""


@query("cdc_origin_filter_state", oracle=_ORIGIN_ORACLE,
       tags=("cdc", "pgoutput", "origin"))
def cdc_origin_filter_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from ..cdc.pgoutput import (
        decode_pgoutput, encode_relation, filter_foreign_origins)
    from ..cdc.transform import apply_pipeline

    (events,) = load(spark, sf_dir, "events")
    e = events.select(
        "event_id", "user_id", "value", "event_type",
        F.expr("event_id div 4").alias("txn"),
    )

    @pandas_udf("binary")
    def enc_row(event_id: pd.Series, user_id: pd.Series, value: pd.Series,
                etype: pd.Series) -> pd.Series:
        from ..cdc.pgoutput import (
            encode_delete, encode_insert, encode_update)

        out = []
        for eid, uid, val, et in zip(event_id, user_id, value, etype):
            if et == "error":
                out.append(encode_delete(1, [int(uid), None], old_kind=b"K"))
            elif int(eid) % 3 == 0:
                out.append(encode_insert(1, [int(uid), repr(float(val))]))
            else:
                out.append(encode_update(1, [int(uid), repr(float(val))]))
        return pd.Series(out)

    rows = e.select(
        (F.col("event_id") * 10).alias("lsn"),
        enc_row("event_id", "user_id", "value", "event_type").alias("payload"),
    )

    txns = e.groupBy("txn").agg(
        F.min("event_id").alias("mn"), F.max("event_id").alias("mx"))

    @pandas_udf("binary")
    def enc_ctrl(kind: pd.Series, txn: pd.Series,
                 lsn_arg: pd.Series) -> pd.Series:
        from ..cdc.pgoutput import encode_begin, encode_commit, encode_origin

        out = []
        for k, tx, la in zip(kind, txn, lsn_arg):
            tx, la = int(tx), int(la)
            if k == "B":
                out.append(encode_begin(la, 0, tx))
            elif k == "O":
                out.append(encode_origin(la, "nodeB"))
            else:
                out.append(encode_commit(la, la + 1, 0))
        return pd.Series(out)

    begins = txns.select(
        (F.col("mn") * 10 - 5).alias("lsn"),
        enc_ctrl(F.lit("B"), "txn", F.col("mx") * 10 + 1).alias("payload"),
    )
    origins = txns.filter(F.col("txn") % 7 == 2).select(
        (F.col("mn") * 10 - 4).alias("lsn"),
        enc_ctrl(F.lit("O"), "txn", F.col("mx") * 10 + 1).alias("payload"),
    )
    commits = txns.select(
        (F.col("mx") * 10 + 1).alias("lsn"),
        enc_ctrl(F.lit("C"), "txn", F.col("mx") * 10 + 1).alias("payload"),
    )
    rel = spark.createDataFrame(
        [(0, bytearray(encode_relation(1, "public", "events",
                                       ["user_id", "value"])))],
        "lsn long, payload binary",
    )
    msgs = rel.unionByName(rows).unionByName(begins).unionByName(origins) \
              .unionByName(commits)
    # bytes-in-storage model: span pairing + origin join + the decode
    # pass all read the capture — materialize the fixture once
    msgs = pin_capture(msgs)

    kept = filter_foreign_origins(msgs, bin_width=64)
    row_schema = StructType(
        [StructField("user_id", LongType()), StructField("value", DoubleType())]
    )
    changes = apply_pipeline(
        decode_pgoutput(kept, row_schema,
                        relations={1: ["user_id", "value"]})
    )
    state = latest_state(changes, keys=["user_id"], order_by=["lsn"], op_col="op")
    return state.select(
        "user_id", F.col("value").alias("last_value")
    ).orderBy("user_id")


# --- raw COPY-stream capture, self-describing decode ---------------------------
# The closest model of a LIVE slot the container permits: frames exactly
# as the socket delivers them — XLogData 'w' wrappers carrying the
# authoritative wal_start (no side lsn column anywhere) interleaved with
# keepalive 'k' frames — and NO hand-written schema: column names, Spark
# types, and key columns all inferred from the Relation message's type
# OIDs (discover_relation_schemas). unwrap_xlogdata is pure JVM (the big
# pass stays in codegen); the decode is driven entirely by the inferred
# metadata. Oracle: plain LWW — green proves framing, wal_start
# ordering, OID->type inference, and typed decode end-to-end.

_XLOG_ORACLE = """
SELECT user_id, value AS last_value
FROM (
  SELECT user_id, value, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
"""


def xlog_infer_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw COPY-stream capture fixture (XLogData frames + keepalive
    noise + retries), unwrapped and localCheckpoint-materialized.
    Factored out of cdc_xlog_infer_state (r11, VERDICT r10 item 2) so
    bench.py times frame encode + unwrap apart from schema inference +
    decode."""
    from pyspark.sql.functions import pandas_udf

    from ..cdc.pgoutput import (
        encode_relation, encode_xlogdata, unwrap_xlogdata)

    (events,) = load(spark, sf_dir, "events")

    @pandas_udf("binary")
    def enc(event_id: pd.Series, user_id: pd.Series, value: pd.Series,
            etype: pd.Series) -> pd.Series:
        from ..cdc.pgoutput import (
            encode_delete, encode_insert, encode_keepalive, encode_update,
            encode_xlogdata)

        out = []
        for eid, uid, val, et in zip(event_id, user_id, value, etype):
            eid, uid = int(eid), int(uid)
            vals = [uid, repr(float(val))]
            if et == "error":
                msg = encode_delete(1, [uid, None], old_kind=b"K")
            elif eid % 3 == 0:
                msg = encode_insert(1, vals)
            else:
                msg = encode_update(1, vals)
            if eid % 9 == 4:  # keepalive noise interleaved in the stream
                out.append(encode_keepalive(eid * 2 + 1))
            else:
                out.append(encode_xlogdata(eid * 2 + 2, msg, clock=eid))
        return pd.Series(out)

    # rows whose slot landed a keepalive still need their change: emit
    # the dropped ones again at the next frame position
    @pandas_udf("binary")
    def enc_retry(event_id: pd.Series, user_id: pd.Series, value: pd.Series,
                  etype: pd.Series) -> pd.Series:
        from ..cdc.pgoutput import (
            encode_delete, encode_insert, encode_update, encode_xlogdata)

        out = []
        for eid, uid, val, et in zip(event_id, user_id, value, etype):
            eid, uid = int(eid), int(uid)
            vals = [uid, repr(float(val))]
            if et == "error":
                msg = encode_delete(1, [uid, None], old_kind=b"K")
            elif eid % 3 == 0:
                msg = encode_insert(1, vals)
            else:
                msg = encode_update(1, vals)
            out.append(encode_xlogdata(eid * 2 + 3, msg, clock=eid))
        return pd.Series(out)

    rel_frame = encode_xlogdata(
        0,
        encode_relation(1, "public", "events", ["user_id", "value"],
                        typoids=[20, 701], key_cols=["user_id"]),
    )
    rel = spark.createDataFrame(
        [(bytearray(rel_frame),)], "frame binary"
    )
    frames = events.select(
        enc("event_id", "user_id", "value", "event_type").alias("frame")
    ).unionByName(
        events.filter(F.col("event_id") % 9 == 4).select(
            enc_retry("event_id", "user_id", "value", "event_type")
            .alias("frame")
        )
    ).unionByName(rel)

    return pin_capture(unwrap_xlogdata(frames))


@query("cdc_xlog_infer_state", oracle=_XLOG_ORACLE,
       tags=("cdc", "pgoutput", "xlogdata", "schema-inference"))
def cdc_xlog_infer_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..cdc.pgoutput import decode_pgoutput, discover_relation_schemas
    from ..cdc.transform import apply_pipeline

    msgs = xlog_infer_capture(spark, sf_dir)
    schemas = discover_relation_schemas(msgs)
    names, inferred, _keys = schemas[1]
    changes = apply_pipeline(
        decode_pgoutput(msgs, inferred, relations={1: names})
    )
    state = latest_state(changes, keys=["user_id"], order_by=["lsn"], op_col="op")
    return state.select(
        "user_id", F.col("value").alias("last_value")
    ).orderBy("user_id")


# --- PG 15 publication column lists + row filters ------------------------------
# Real deployments rarely publish whole tables: PG 15 publications take a
# COLUMN LIST (unlisted columns never reach the slot — the reference's
# FOR ALL TABLES publication, terraform/setup_database.sql:17, is the
# degenerate "all columns, no filter" case) and a WHERE row filter with
# capture-side transition semantics (logical-replication docs): an
# UPDATE whose old row failed the filter but whose new row passes
# arrives as INSERT; passing->failing arrives as DELETE (key only);
# failing->failing and filtered INSERTs/DELETEs are suppressed
# entirely. The ENGINE-side contracts this query pins: (1) a Relation
# message carrying only the published columns decodes rows with the
# unpublished schema columns NULL (capture-side projection, engine
# schema unchanged), and (2) the transition-routed stream upserts to
# exactly the filter-satisfying state — no ghost rows from
# filtered-out updates, no lost deletes at the filter boundary.
# Fixture: publication (user_id, value) WHERE (value >= 50) over the
# events changelog; each event's value is the row image (LAG gives the
# old image), error events are deletes. The oracle replays the same
# transition table in SQL — a green row proves suppression, both
# transition routings, the key-only boundary DELETE, and the
# column-list NULL end-to-end.

_PUB_FILTER_THRESHOLD = 50.0

_PUB_FILTER_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_id, value, event_type,
         LAG(value) OVER (PARTITION BY user_id ORDER BY event_id)
           AS prev_value
  FROM events
),
pub AS (
  SELECT user_id AS k, value AS v, event_id + 1 AS ord,
    CASE
      WHEN event_type = 'error' THEN
        CASE WHEN prev_value >= {_PUB_FILTER_THRESHOLD} THEN 'D' END
      WHEN prev_value IS NULL THEN
        CASE WHEN value >= {_PUB_FILTER_THRESHOLD} THEN 'I' END
      WHEN prev_value >= {_PUB_FILTER_THRESHOLD}
           AND value >= {_PUB_FILTER_THRESHOLD} THEN 'U'
      WHEN prev_value < {_PUB_FILTER_THRESHOLD}
           AND value >= {_PUB_FILTER_THRESHOLD} THEN 'I'
      WHEN prev_value >= {_PUB_FILTER_THRESHOLD}
           AND value < {_PUB_FILTER_THRESHOLD} THEN 'D'
    END AS op
  FROM seq
)
SELECT k AS user_id, v AS last_value, CAST(NULL AS VARCHAR) AS etype_unpublished
FROM (
  SELECT k, v, op, ROW_NUMBER() OVER (PARTITION BY k ORDER BY ord DESC) AS rn
  FROM pub WHERE op IS NOT NULL
) WHERE rn = 1 AND op <> 'D'
ORDER BY user_id
"""


def publication_filter_capture(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """The encoded PG 15 publication capture fixture (column-list
    relation frame + transition-routed row frames under the value >= 50
    row filter), localCheckpoint-materialized. Factored out of
    cdc_publication_filter_state (r11, VERDICT r10 item 2) so bench.py
    times capture-side encode apart from decode + upsert, and so the
    streaming twin can replay the SAME capture through readStream."""
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    from ..cdc.pgoutput import encode_relation

    (events,) = load(spark, sf_dir, "events")
    thr = _PUB_FILTER_THRESHOLD

    @pandas_udf("binary")
    def enc(user_id: pd.Series, value: pd.Series, etype: pd.Series,
            prev_value: pd.Series) -> pd.Series:
        from ..cdc.pgoutput import (
            encode_delete, encode_insert, encode_update)

        out = []
        for uid, val, et, prev in zip(user_id, value, etype, prev_value):
            uid, val = int(uid), float(val)
            has_prev = prev == prev and prev is not None  # NaN-safe
            old_ok = has_prev and float(prev) >= thr
            new_ok = val >= thr
            v = repr(val)
            if et == "error":
                # DELETE: published iff the OLD row satisfied the filter
                out.append(encode_delete(1, [uid, None], old_kind=b"K")
                           if old_ok else None)
            elif not has_prev:
                out.append(encode_insert(1, [uid, v]) if new_ok else None)
            elif old_ok and new_ok:
                out.append(encode_update(1, [uid, v]))
            elif not old_ok and new_ok:
                # row ENTERS the publication: arrives as INSERT
                out.append(encode_insert(1, [uid, v]))
            elif old_ok and not new_ok:
                # row LEAVES the publication: arrives as key-only DELETE
                out.append(encode_delete(1, [uid, None], old_kind=b"K"))
            else:
                out.append(None)  # suppressed: never reaches the slot
        return pd.Series(out)

    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = events.withColumn("prev_value", F.lag("value").over(w))
    # Relation message carries ONLY the published column list
    rel = spark.createDataFrame(
        [(0, bytearray(encode_relation(1, "public", "events",
                                       ["user_id", "value"])))],
        "lsn long, payload binary",
    )
    msgs = rel.unionByName(
        seq.select(
            (F.col("event_id") + 1).alias("lsn"),
            enc("user_id", "value", "event_type", "prev_value")
            .alias("payload"),
        ).filter(F.col("payload").isNotNull())  # suppressed rows
    )
    return pin_capture(msgs)


@query("cdc_publication_filter_state", oracle=_PUB_FILTER_ORACLE,
       tags=("cdc", "pgoutput", "publication", "row-filter"))
def cdc_publication_filter_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import (DoubleType, LongType, StringType,
                                   StructField, StructType)

    from ..cdc.pgoutput import decode_pgoutput
    from ..cdc.transform import apply_pipeline

    msgs = publication_filter_capture(spark, sf_dir)
    # The TABLE schema still has event_type; the publication never sends
    # it, so every decoded image must carry it as NULL (contract 1).
    row_schema = StructType([
        StructField("user_id", LongType()),
        StructField("value", DoubleType()),
        StructField("event_type", StringType()),
    ])
    env = decode_pgoutput(msgs, row_schema,
                          relations={1: ["user_id", "value"]})
    changes = apply_pipeline(env)
    state = latest_state(changes, keys=["user_id"], order_by=["lsn"],
                         op_col="op")
    return state.select(
        "user_id", F.col("value").alias("last_value"),
        F.col("event_type").alias("etype_unpublished"),
    ).orderBy("user_id")
