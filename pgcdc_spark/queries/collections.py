"""Array / map collection functions (SURVEY.md §2.2 projection table rows
"array fns" and "map fns") as oracle-checked queries.

The reference has no collection types at all (primitive columns only,
terraform/setup_database.sql:1-15); these operators are part of the
engine's broadened surface. Arrays come from tokenizing `documents.text`;
maps are constructed with `create_map` and read back with map accessors —
the DuckDB oracle computes the same *values* without maps (the contract
is value parity, not plan parity).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from . import query

# --- array functions: split/size/contains/sort/slice/distinct ----------------

_ARRAY_ORACLE = """
SELECT
  doc_id,
  len(string_split(text, ' ')) AS n_tokens,
  len(list_distinct(string_split(text, ' '))) AS n_unique,
  list_contains(string_split(text, ' '), 'the') AS has_the,
  list_sort(string_split(text, ' '))[1] AS first_token_sorted,
  array_to_string(string_split(text, ' ')[1:3], ' ') AS first_three
FROM documents
WHERE n_chars >= 100
"""


@query("scalar_array_fns", oracle=_ARRAY_ORACLE, tags=("scalar", "array"))
def scalar_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    return docs.filter(F.col("n_chars") >= 100).select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_unique"),
        F.array_contains(w, "the").alias("has_the"),
        F.element_at(F.sort_array(w), 1).alias("first_token_sorted"),
        F.array_join(F.slice(w, 1, 3), " ").alias("first_three"),
    )


# --- higher-order array lambdas: transform / filter / aggregate --------------

_HOF_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE n_chars >= 100
)
SELECT
  doc_id,
  list_transform(w, x -> len(x))[1] AS first_len,
  len(list_filter(w, x -> len(x) > 4)) AS n_long,
  list_sum(list_transform(w, x -> len(x)))::BIGINT AS total_chars
FROM t
"""


@query("scalar_array_lambdas", oracle=_HOF_ORACLE, tags=("scalar", "array", "hof"))
def scalar_array_lambdas(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("n_chars") >= 100)
        .select("doc_id", F.split("text", " ").alias("w"))
        .select(
            "doc_id",
            F.element_at(F.transform("w", lambda x: F.length(x)), 1).alias("first_len"),
            F.size(F.filter("w", lambda x: F.length(x) > 4)).alias("n_long"),
            F.aggregate(
                F.transform("w", lambda x: F.length(x).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("total_chars"),
        )
    )


# --- map functions: create_map / map_keys / map_values / element_at ----------

_MAP_ORACLE = """
SELECT
  doc_id,
  lang AS m_lang,
  source AS m_source,
  2 AS n_keys,
  'lang' AS first_key
FROM documents
WHERE doc_id < 100
"""


@query("scalar_map_fns", oracle=_MAP_ORACLE, tags=("scalar", "map"))
def scalar_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a map column and read it back through the map accessors; the
    oracle computes the same values directly (value parity, and insertion
    order is defined for create_map so map_keys is deterministic)."""
    (docs,) = load(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    return docs.filter(F.col("doc_id") < 100).select(
        "doc_id",
        F.element_at(m, "lang").alias("m_lang"),
        F.element_at(m, "source").alias("m_source"),
        F.size(m).alias("n_keys"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
    )


# --- json_tuple + to_json (rounds out the JSON row of §2.2) ------------------

_JSON_TUPLE_ORACLE = """
SELECT
  event_id,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
  json_extract_string(props, '$.cat') AS cat
FROM events
WHERE event_id < 500
"""


@query("events_json_tuple", oracle=_JSON_TUPLE_ORACLE, tags=("json",))
def events_json_tuple(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_id") < 500)
        .select("event_id", F.json_tuple("props", "k", "cat").alias("k", "cat"))
        .select("event_id", F.col("k").cast("long").alias("k"), "cat")
    )
