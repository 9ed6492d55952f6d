"""Online (additive) schema evolution for the CDC pipeline.

The reference cannot see upstream schema changes at all: it filters out
`relation` messages — pgoutput's schema-change notifications —
(src/mapping/customMapper.ts:12-13) and hard-casts every image to a fixed
compile-time model (src/mapping/customMapper.ts:22), so an upstream
``ALTER TABLE ADD COLUMN`` silently vanishes from the feed. At 100 TB,
"stop and reprocess with the new schema" is not an option; evolution must
happen online. Design:

- **Discovery**: images are additionally parsed as ``map<string,string>``
  (schema-free), and the distinct key set is compared against the known
  row schema. The key set is *schema metadata* — inherently tiny and
  inherently a driver-side decision — so collecting it is legitimate (the
  one sanctioned collect in the engine; it is O(columns), not O(rows)).
- **Promotion**: unknown columns extend the StructType as STRING — the
  lossless default; a later migration can tighten the type. Known columns
  keep their declared types (the checked ``from_json`` path is unchanged).
- **Type widening**: a known column whose incoming values stop fitting
  the declared type (upstream ``ALTER COLUMN TYPE``; e.g. an int column
  starts carrying labels) is detected by comparing the schema-free map
  parse against the typed parse — a non-null raw value with a null typed
  value is a type-mismatch signal — and the column is re-declared STRING
  (same lossless default; one metadata-sized aggregate, then one
  re-parse). Without this, the checked parse would silently NULL every
  post-change value — the quiet corruption flavor of the reference's
  unchecked-cast bug.
- **Materialization**: merging unions by name with
  ``allowMissingColumns=True`` — pre-evolution state rows read NULL for
  new columns. Additive-only, so history needs no rewrite; at scale the
  already-written snapshot files stay valid because parquet readers merge
  file schemas.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import MapType, StringType, StructField, StructType

from .envelope import STUDENT_SCHEMA, parse_envelope
from .upsert import latest_state

_MAP_IMAGE = MapType(StringType(), StringType())

_MAP_ENVELOPE = StructType(
    [
        StructField("lsn", StringType()),
        StructField("tag", StringType()),
        StructField("new", _MAP_IMAGE),
        StructField("old", _MAP_IMAGE),
    ]
)


def discover_image_columns(raw: DataFrame, json_col: str = "value") -> list[str]:
    """Distinct image keys across ``new`` and ``old``, sorted.

    One distributed distinct over exploded map keys; only the (tiny)
    resulting column-name set reaches the driver.
    """
    parsed = raw.select(
        F.from_json(F.col(json_col), _MAP_ENVELOPE).alias("e")
    )
    keys = (
        parsed.select(F.explode(F.map_keys(F.coalesce("e.new", F.create_map()))).alias("k"))
        .union(
            parsed.select(
                F.explode(F.map_keys(F.coalesce("e.old", F.create_map()))).alias("k")
            )
        )
        .distinct()
    )
    return sorted(r["k"] for r in keys.collect())


def discover_widened_columns(
    raw: DataFrame, json_col: str = "value",
    base_schema: StructType = STUDENT_SCHEMA,
) -> list[str]:
    """Known columns whose typed parse NULLs values the schema-free map
    parse carries — the signature of an upstream type change. One
    aggregation pass; the result is O(columns) metadata."""
    from .envelope import envelope_schema

    typed = F.from_json(F.col(json_col), envelope_schema(base_schema))
    mapped = F.from_json(F.col(json_col), _MAP_ENVELOPE)
    pair = raw.select(typed.alias("t"), mapped.alias("m"))
    aggs = []
    for f in base_schema.fields:
        mism = F.lit(0).cast("long")
        for side in ("new", "old"):
            raw_v = F.col(f"m.{side}")[f.name]
            typed_v = F.col(f"t.{side}.{f.name}")
            mism = mism + (raw_v.isNotNull() & typed_v.isNull()).cast("long")
        aggs.append(F.sum(mism).alias(f.name))
    row = pair.agg(*aggs).collect()[0]
    return sorted(f.name for f in base_schema.fields if (row[f.name] or 0) > 0)


def evolve_row_schema(
    base: StructType, discovered: list[str], widened: list[str] | tuple = (),
) -> StructType:
    """Extend ``base`` with any discovered column it lacks (as STRING) and
    re-declare ``widened`` known columns as STRING.

    Existing fields keep their order (and, unless widened, their types),
    so readers of the old schema are never broken.
    """
    known = {f.name for f in base.fields}
    extras = [c for c in discovered if c not in known]
    widen = set(widened)
    fields = [
        StructField(f.name, StringType()) if f.name in widen else f
        for f in base.fields
    ]
    return StructType(fields + [StructField(c, StringType()) for c in extras])


def parse_envelope_evolving(
    raw: DataFrame,
    json_col: str = "value",
    base_schema: StructType = STUDENT_SCHEMA,
    widen_types: bool = True,
) -> tuple[DataFrame, StructType]:
    """Checked envelope parse that ADMITS unknown image columns and
    (optionally) WIDENS known columns whose values no longer fit.

    Returns ``(parsed, evolved_schema)`` where ``evolved_schema`` is
    ``base_schema`` plus discovered extras (STRING-typed), with
    type-mismatching known columns re-declared STRING. The parse itself
    is the standard vectorized ``from_json`` fast path — discovery adds
    one or two metadata-sized passes over the batch, not a per-row UDF.
    """
    widened = discover_widened_columns(raw, json_col, base_schema) if widen_types else []
    evolved = evolve_row_schema(
        base_schema, discover_image_columns(raw, json_col), widened
    )
    return parse_envelope(raw, json_col, row_schema=evolved), evolved


def merge_batch_evolving(
    state: DataFrame,
    batch: DataFrame,
    keys: list[str],
    order_by: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """``upsert.merge_batch`` for batches whose schema may have grown.

    Union by name with ``allowMissingColumns=True``: rows from before the
    evolution read NULL in the new columns, new rows carry values — then
    the usual per-key compaction (tombstones retained, as in merge_batch).

    Columns whose TYPE diverged (the batch widened them) cast to STRING on
    both sides first — the state table's going-forward type. Note for the
    bucketed store: already-written bucket files keep the old physical
    type, so a widening should be followed by a store compaction (one
    fold rewrites every bucket under the new schema) before mixed-type
    version dirs accumulate.
    """
    s_types = {f.name: f.dataType for f in state.schema.fields}
    b_types = {f.name: f.dataType for f in batch.schema.fields}
    for c in sorted(set(s_types) & set(b_types)):
        if s_types[c] != b_types[c]:
            state = state.withColumn(c, F.col(c).cast("string"))
            batch = batch.withColumn(c, F.col(c).cast("string"))
    combined = state.unionByName(batch, allowMissingColumns=True)
    return latest_state(
        combined, keys, order_by, op_col, delete_op, keep_deletes=True
    )
