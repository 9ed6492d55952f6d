"""MongoDB change-stream -> engine envelope adapter (+ patch materialization).

The reference's north star names CDC for PostgreSQL *and* MongoDB; the
reference itself only ever subscribes to a pgoutput slot
(src/database/postgresql/PostgresLogicalPg.ts:30-42). MongoDB's public
change-stream API is the Mongo-side analogue of that slot: a watch cursor
emitting one JSON document per change. This module is the pure mapping
from change-stream documents to the engine envelope (cdc/envelope.py), so
the existing pipeline — control filter, image extraction, tombstone-aware
upsert — runs unchanged on a Mongo feed.

Field mapping (change-stream document -> engine envelope):

    operationType      -> tag     insert -> insert, replace -> update
                                  (a full-image upsert), update -> update,
                                  delete -> delete; drop / rename /
                                  dropDatabase / invalidate pass through
                                  the parse and are dropped by
                                  filter_control_messages (see
                                  CONTROL_OPERATIONS), like pgoutput
                                  control tags
    fullDocument       -> new     present on insert/replace, and on
                                  update when the stream runs with
                                  fullDocument=updateLookup
    documentKey        -> old     for deletes (Mongo sends only the key —
                                  exactly what the keyed upsert needs)
    _id._data          -> lsn     the resume token, zero-padded; falls
                                  back to clusterTime (t, i) when the
                                  token is absent
    malformed line     -> _corrupt  dead-letter column, as in
                                  parse_envelope

Partial updates: without updateLookup, an update event carries NO full
image — only ``updateDescription.updatedFields`` (changed fields) and
``updateDescription.removedFields`` (unset fields). ``patch_state``
materializes current state from such a feed without ever fetching full
documents: per key it finds the latest full-image anchor (insert /
replace / delete), then per FIELD applies the latest set/remove patch
ordered after that anchor. Everything is keyed joins + aggregates — per
(key, field) the winner is a ``max_by``, so a hot document collapses
map-side exactly like cdc/upsert.latest_state and no window forces a
one-task key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# Width every lsn is left-padded to.  Real resume tokens (_id._data) are
# KeyString hex, typically 60-180 chars; the pad width must comfortably
# exceed that because Spark's lpad TRUNCATES inputs longer than the pad
# width — a truncated token collides with every token sharing its prefix
# and silently corrupts max_by ordering.  Tokens longer than the pad are
# rejected loudly (raise_error) rather than truncated.
_LSN_PAD = 256

# operationTypes that carry no row image — the Mongo analogues of
# pgoutput's begin/commit/relation control messages. They survive the
# parse (visible to monitoring) and are dropped explicitly by
# cdc/transform.filter_control_messages, which filters on this constant.
CONTROL_OPERATIONS = ("drop", "rename", "dropDatabase", "invalidate")


def changestream_schema(row_schema: StructType, key_schema: StructType) -> StructType:
    """Schema of one change-stream document, as serialized to JSON.

    ``updatedFields`` parses as map<string,string>: patch values arrive
    stringly and are cast to the row schema's field types at
    materialization (same promotion discipline as cdc/evolution.py).
    """
    return StructType(
        [
            StructField("_id", StructType([StructField("_data", StringType())])),
            StructField("operationType", StringType()),
            StructField(
                "clusterTime",
                StructType([StructField("t", LongType()), StructField("i", LongType())]),
            ),
            StructField("fullDocument", row_schema),
            StructField("documentKey", key_schema),
            StructField(
                "updateDescription",
                StructType(
                    [
                        StructField("updatedFields", MapType(StringType(), StringType())),
                        StructField("removedFields", ArrayType(StringType())),
                    ]
                ),
            ),
            StructField(
                "ns",
                StructType(
                    [StructField("db", StringType()), StructField("coll", StringType())]
                ),
            ),
        ]
    )


def _tag_expr(op: F.Column) -> F.Column:
    return (
        F.when(op == "insert", "insert")
        .when(op == "replace", "update")  # full-image upsert
        .when(op == "update", "update")
        .when(op == "delete", "delete")
        .otherwise(op)  # control operations pass through and drop later
    )


def _lsn_expr() -> F.Column:
    """Resume token when present (already monotonic per stream), else a
    (clusterTime.t, clusterTime.i) composite — zero-padded so the engine's
    lexicographic lsn order equals the stream order either way.

    The two encodings are NOT mutually comparable, so each lsn carries a
    one-char encoding-rank prefix: ``c`` (clusterTime) < ``t`` (token).
    A uniform feed (the normal case — all-token, or all-clusterTime for
    synthetic replays) is untouched by the prefix; a MIXED feed no longer
    interleaves nondeterministically — every clusterTime-derived lsn
    orders before every token-derived one, deterministically, and the
    ``lsn_encoding`` column emitted by parse_mongo_changestream makes the
    mix observable upstream.

    Tokens longer than _LSN_PAD raise (Spark lpad would otherwise
    truncate them, colliding every token that shares the prefix)."""
    tok = F.col("_cs._id._data")
    from_token = F.when(
        F.length(tok) > _LSN_PAD,
        F.raise_error(
            F.concat(
                F.lit(f"mongo resume token exceeds _LSN_PAD={_LSN_PAD} chars: "), tok
            )
        ),
    ).otherwise(F.concat(F.lit("t"), F.lpad(tok, _LSN_PAD, "0")))
    from_time = F.concat(
        F.lit("c"),
        F.lpad(
            F.concat(
                F.lpad(F.col("_cs.clusterTime.t").cast("string"), 20, "0"),
                F.lpad(F.col("_cs.clusterTime.i").cast("string"), 20, "0"),
            ),
            _LSN_PAD,
            "0",
        ),
    )
    return F.when(tok.isNotNull(), from_token).otherwise(from_time)


def _lsn_encoding_expr() -> F.Column:
    """Which lsn encoding each event used — ``token`` or ``clustertime``.

    Monitoring surface for the mixed-feed guard: a healthy stream shows
    exactly one distinct value; a mix means the producer interleaved
    token-less synthetic events into a real feed (ordered c-before-t by
    construction, see _lsn_expr)."""
    return F.when(F.col("_cs._id._data").isNotNull(), F.lit("token")).otherwise(
        F.lit("clustertime")
    )


def _key_as_row(row_schema: StructType, key_schema: StructType) -> F.Column:
    """Lift documentKey into the row-image shape (key fields set, rest
    null) so delete events carry a typed ``old`` image."""
    key_fields = {f.name for f in key_schema.fields}
    cols = [
        (
            F.col(f"_cs.documentKey.{f.name}")
            if f.name in key_fields
            else F.lit(None).cast(f.dataType)
        ).alias(f.name)
        for f in row_schema.fields
    ]
    return F.struct(*cols)


def parse_mongo_changestream(
    raw: DataFrame,
    row_schema: StructType,
    key_schema: StructType,
    json_col: str = "value",
) -> DataFrame:
    """Parse change-stream JSON lines into engine envelope columns
    ``(lsn, tag, new, old, _corrupt)`` plus the patch columns
    ``(patch, removed)`` consumed by ``patch_state`` and the
    ``lsn_encoding`` monitoring column (``token``/``clustertime``,
    see _lsn_encoding_expr).

    The envelope subset feeds cdc/transform.apply_pipeline unchanged
    (updateLookup/full-image mode); the patch columns make the same
    DataFrame usable by the partial-update materializer.
    """
    schema = changestream_schema(row_schema, key_schema).add(
        StructField("_corrupt", StringType())
    )
    parsed = raw.withColumn(
        "_cs",
        F.from_json(
            F.col(json_col),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ),
    )
    op = F.col("_cs.operationType")
    # Change streams send documentKey on every row-change event; coalesce
    # with the full image's key fields for robustness against feeds that
    # omit it on inserts.
    key_struct = F.struct(
        *[
            F.coalesce(
                F.col(f"_cs.documentKey.{f.name}"), F.col(f"_cs.fullDocument.{f.name}")
            ).alias(f.name)
            for f in key_schema.fields
        ]
    )
    return parsed.select(
        _lsn_expr().alias("lsn"),
        _lsn_encoding_expr().alias("lsn_encoding"),
        _tag_expr(op).alias("tag"),
        F.col("_cs.fullDocument").alias("new"),
        F.when(op == "delete", _key_as_row(row_schema, key_schema)).alias("old"),
        key_struct.alias("key"),
        F.col("_cs.updateDescription.updatedFields").alias("patch"),
        F.col("_cs.updateDescription.removedFields").alias("removed"),
        F.col("_cs._corrupt").alias("_corrupt"),
    )


def patch_state(
    changes: DataFrame,
    row_schema: StructType,
    keys: list[str],
    order_col: str = "lsn",
) -> DataFrame:
    """Materialize current state from a partial-update change feed.

    ``changes`` is the output of ``parse_mongo_changestream`` (no
    updateLookup: update events have ``new`` null and carry
    ``patch``/``removed``). Semantics, per key:

    - the latest FULL-IMAGE event (insert / replace / delete) is the
      anchor; its image is the base document (a delete anchors an empty
      base);
    - per field, the latest set/remove patch ordered AFTER the anchor
      overrides the base (a remove sets the field null);
    - the key is present iff the anchor is not a delete, or any patch
      follows the delete (patch-upsert recreates the document).

    Scale shape: one keyed aggregate for anchors, one explode of patched
    fields (rows = patches x touched fields, NOT rows x schema width),
    one per-(key, field) max_by, one map_from_entries rollup, one keyed
    join to merge — no window, no collect, every shuffle on the document
    key. At 100 TB this is the same single-key-shuffle contract as
    latest_state.
    """
    fields = [f for f in row_schema.fields if f.name not in set(keys)]
    is_full = F.col("tag").isin("insert", "update", "delete") & (
        F.col("new").isNotNull() | (F.col("tag") == "delete")
    )

    full = changes.filter(is_full).select(
        *[F.col(f"key.{k}").alias(k) for k in keys],
        F.col(order_col).alias("__ord"),
        (F.col("tag") == "delete").alias("__is_delete"),
        F.col("new").alias("__image"),
    )
    anchors = (
        full.groupBy(*keys)
        .agg(
            F.max_by(
                F.struct("__ord", "__is_delete", "__image"), F.col("__ord")
            ).alias("__a")
        )
        .select(*keys, "__a.__ord", "__a.__is_delete", "__a.__image")
    )

    patches = changes.filter(
        (F.col("tag") == "update") & F.col("new").isNull()
        & (F.col("patch").isNotNull() | F.col("removed").isNotNull())
    )
    # A set/remove action travels as a NON-NULL struct so the per-field
    # max_by winner is well-defined even when the winning action is a
    # remove (a bare null value would hit engine-specific
    # nulls-in-max_by behavior).
    sets = patches.filter(F.col("patch").isNotNull()).select(
        *[F.col(f"key.{k}").alias(k) for k in keys],
        F.col(order_col).alias("__ord"),
        F.explode("patch").alias("__field", "__v"),
    ).select(
        *keys, "__ord", "__field",
        F.struct(F.lit(True).alias("set"), F.col("__v").alias("val")).alias("__act"),
    )
    removes = patches.filter(F.col("removed").isNotNull()).select(
        *[F.col(f"key.{k}").alias(k) for k in keys],
        F.col(order_col).alias("__ord"),
        F.explode("removed").alias("__field"),
        F.struct(
            F.lit(False).alias("set"), F.lit(None).cast("string").alias("val")
        ).alias("__act"),
    ).select(*keys, "__ord", "__field", "__act")

    all_patches = sets.unionByName(removes)
    # Gate to patches after the anchor (or all patches when no anchor).
    gated = (
        all_patches.join(anchors.select(*keys, F.col("__ord").alias("__aord")), keys, "left")
        .filter(F.col("__aord").isNull() | (F.col("__ord") > F.col("__aord")))
    )
    latest_patch = (
        gated.groupBy(*keys, "__field")
        .agg(F.max_by("__act", "__ord").alias("__act"), F.max("__ord").alias("__ord"))
    )
    # bounded buffer: latest_patch is already one row per (key, field),
    # so this collect_list holds at most #schema-fields entries per key —
    # document WIDTH, never changelog length (hot keys are safe)
    patch_maps = latest_patch.groupBy(*keys).agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    "__field", F.when(F.col("__act.set"), F.col("__act.val")).alias("__v")
                )
            )
        ).alias("__pm"),
        F.max("__ord").alias("__last_patch_ord"),
    )

    merged = anchors.join(patch_maps, keys, "full")
    alive = (~F.coalesce(F.col("__is_delete"), F.lit(False))) | F.col(
        "__last_patch_ord"
    ).isNotNull()
    out_cols = [F.col(k) for k in keys] + [
        F.when(
            F.map_contains_key(F.col("__pm"), f.name),
            F.col("__pm")[f.name].cast(f.dataType),
        )
        .otherwise(
            F.when(
                ~F.coalesce(F.col("__is_delete"), F.lit(False)),
                F.col(f"__image.{f.name}"),
            )
        )
        .alias(f.name)
        for f in fields
    ]
    return merged.filter(alive).select(*out_cols)
