"""wal2json adapter — the OTHER logical-decoding plugin format.

The reference's stack selects a decoding plugin by name
(src/config/config.ts:21-24, pgoutput in the checked-in config);
wal2json is the common alternative, and its shape differs from
pgoutput in two ways that matter to an engine:

1. it is a TRANSACTION envelope: one JSON document per commit with an
   ordered ``change`` array — so intra-transaction order is positional
   (the array index), not a per-row LSN; the engine must fold it into
   the ordering key or same-key changes inside one transaction resolve
   arbitrarily;
2. row images arrive as PARALLEL ARRAYS (``columnnames`` /
   ``columnvalues``, all values as text; delete old-keys as
   ``oldkeys.keynames/keyvalues``) instead of named structs.

parse_wal2json normalizes both entirely with JVM built-ins — from_json,
posexplode for the ordinal, map_from_arrays for name->text, and
per-field try_cast for the CHECKED text->type conversion (malformed
text becomes NULL, never an ANSI cast error aborting the batch — the
same contract as the pgoutput decoder and the engine-wide fix for the
reference's unchecked cast, src/mapping/customMapper.ts:22). Output is
the standard envelope frame (lsn, tag, new, old) with lsn =
"<hi>/<lo>/<change ordinal>" — the pg_lsn 'X/Y' hex halves each
zero-padded to a fixed width — so the unchanged
filter -> extract -> upsert pipeline gets a total order. No Python
runs per row: at 100 TB this is whole-stage-codegen JSON work, the
deliberate contrast to pgoutput's (necessarily) Arrow-batched binary
decode.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

_CHANGE = StructType(
    [
        StructField("kind", StringType()),
        StructField("schema", StringType()),
        StructField("table", StringType()),
        StructField("columnnames", ArrayType(StringType())),
        StructField("columnvalues", ArrayType(StringType())),
        StructField(
            "oldkeys",
            StructType(
                [
                    StructField("keynames", ArrayType(StringType())),
                    StructField("keyvalues", ArrayType(StringType())),
                ]
            ),
        ),
    ]
)

_DOC = StructType(
    [
        StructField("lsn", StringType()),
        StructField("change", ArrayType(_CHANGE)),
    ]
)

_KIND_TO_TAG = {"insert": "insert", "update": "update", "delete": "delete"}


def _typed_image(map_col: F.Column, row_schema: StructType) -> F.Column:
    """name->text map folded into the caller's typed struct, one
    try_cast per field (checked: bad text -> NULL field)."""
    return F.struct(
        *[
            F.element_at(map_col, f.name).try_cast(f.dataType).alias(f.name)
            for f in row_schema.fields
        ]
    )


def parse_wal2json(
    raw: DataFrame, row_schema: StructType, json_col: str = "value",
    track_unchanged: bool = False,
) -> DataFrame:
    """Transaction documents -> one envelope row per change, ordered by
    (transaction lsn, change ordinal) folded into a zero-padded sortable
    lsn string. Unknown kinds (truncate/message) pass through with null
    images and are dropped by the standard control/image filters.

    wal2json renders an unchanged-TOAST column by OMITTING it from the
    columnnames/columnvalues arrays (a genuine SQL NULL is present with
    a null value) — so upserting images verbatim NULL-overwrites stored
    values, the same TOAST hazard as pgoutput's 'u' datum.
    ``track_unchanged=True`` adds an ``unchanged`` column naming the
    schema fields absent from the wire arrays (JVM filter, no Python);
    feed it to upsert.toast_state to carry stored values forward."""
    doc = raw.withColumn("_doc", F.from_json(F.col(json_col), _DOC))
    ch = doc.select(
        F.col("_doc.lsn").alias("_txn_lsn"),
        F.posexplode_outer("_doc.change").alias("_idx", "_ch"),
    )
    new_map = F.map_from_arrays("_ch.columnnames", "_ch.columnvalues")
    old_map = F.map_from_arrays("_ch.oldkeys.keynames", "_ch.oldkeys.keyvalues")
    is_del = F.col("_ch.kind") == "delete"
    has_new = F.col("_ch.columnnames").isNotNull()
    has_old = F.col("_ch.oldkeys").isNotNull()
    # Real wal2json emits the PostgreSQL 'X/Y' HEXADECIMAL pg_lsn form
    # (e.g. "0/16B3748"): lpad-ing the raw string and comparing
    # lexicographically diverges from WAL order the moment the hex digit
    # count changes (lpad('0/10') sorts BELOW lpad('0/9') though
    # 0x10 > 0x9) — so each half is zero-padded SEPARATELY to a fixed
    # width, which makes string order equal numeric order. A bare
    # numeric lsn (no '/') is treated as the low half; hex digits are
    # uppercased so 'a'-'f' renderings sort with 'A'-'F'. Both parses
    # are order-preserving for plain decimal strings too (any shorter
    # digit string is numerically smaller in base 16 as well).
    has_slash = F.instr(F.col("_txn_lsn"), "/") > 0
    lsn_hi = F.when(has_slash, F.substring_index(F.col("_txn_lsn"), "/", 1)
                    ).otherwise(F.lit("0"))
    lsn_lo = F.when(has_slash, F.substring_index(F.col("_txn_lsn"), "/", -1)
                    ).otherwise(F.col("_txn_lsn"))
    return ch.select(
        F.concat(
            F.lpad(F.upper(lsn_hi), 16, "0"),
            F.lit("/"),
            F.lpad(F.upper(lsn_lo), 16, "0"),
            F.lit("/"),
            F.lpad(F.col("_idx").cast("string"), 8, "0"),
        ).alias("lsn"),
        F.coalesce(
            F.element_at(
                F.create_map(
                    *[F.lit(x) for kv in _KIND_TO_TAG.items() for x in kv]
                ),
                F.col("_ch.kind"),
            ),
            F.lit("_control"),
        ).alias("tag"),
        F.when(~is_del & has_new, _typed_image(new_map, row_schema)).alias("new"),
        # oldkeys ride DELETEs *and* key-changing UPDATEs (wal2json emits
        # them whenever the replica identity changed) — surfacing both is
        # what lets transform.split_key_updates retire the old key
        F.when(has_old, _typed_image(old_map, row_schema)).alias("old"),
        *(
            [
                F.when(
                    ~is_del & has_new,
                    F.filter(
                        F.array(*[F.lit(f.name) for f in row_schema.fields]),
                        lambda n: ~F.array_contains(
                            F.col("_ch.columnnames"), n
                        ),
                    ),
                ).alias("unchanged")
            ]
            if track_unchanged
            else []
        ),
    )
