"""SQL-surface widening: exact median + deterministic mode, width_bucket
histograms, try_* safe arithmetic, ordered string aggregation, and
posexplode with ordinals.

None of these exist in the reference (no query surface beyond SELECT *,
src/utilities/query.ts:13); all are table-stakes engine functions a user
migrating analytical workloads expects, and all are pure built-ins —
no UDFs, no collect, each query at most two small shuffles.

Oracle-parity notes (the usual discipline, see queries/__init__ docstring):
- median: Spark ``percentile(x, 0.5)`` and DuckDB ``quantile_cont(x, 0.5)``
  both linearly interpolate; l_quantity holds small integers-as-doubles so
  midpoints are exact halves — bit-identical on both engines;
- mode: NEVER the built-in ``mode()`` (tie-breaking is engine-arbitrary);
  both sides compute count-per-value then argmax with an explicit
  (count DESC, value ASC) total order;
- try_cast/try_divide: Spark's try_* return NULL on failure; DuckDB
  mirrors with TRY_CAST and NULLIF-guarded division.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load
from . import query

# --- exact median + deterministic mode ---------------------------------------

_MEDIAN_MODE_ORACLE = """
WITH med AS (
  SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty,
         COUNT(*) AS n_rows
  FROM lineitem GROUP BY l_returnflag
),
cnt AS (
  SELECT l_returnflag, l_linestatus, COUNT(*) AS c
  FROM lineitem GROUP BY l_returnflag, l_linestatus
),
md AS (
  SELECT l_returnflag, l_linestatus AS mode_status FROM (
    SELECT l_returnflag, l_linestatus,
           ROW_NUMBER() OVER (PARTITION BY l_returnflag
                              ORDER BY c DESC, l_linestatus) AS rn
    FROM cnt
  ) WHERE rn = 1
)
SELECT m.l_returnflag, m.median_qty, d.mode_status, m.n_rows
FROM med m JOIN md d ON d.l_returnflag = m.l_returnflag
"""


@query("agg_median_mode", oracle=_MEDIAN_MODE_ORACLE, tags=("agg", "percentile"))
def agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median + deterministic mode per group.

    Median is the exact ``percentile`` aggregate (sort-based within each
    group — fine because groups here are few and, at scale, percentile
    switches to approx_percentile as the documented knob). Mode is a
    two-level aggregate: count per (group, value) with map-side partial
    combine, then an argmax window over the tiny per-group value counts —
    the skew-safe shape (the heavy shuffle carries one row per distinct
    value, not per input row)."""
    (li,) = load(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    cnt = li.groupBy("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("c").desc(), F.col("l_linestatus")
    )
    md = (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_linestatus").alias("mode_status"))
    )
    return med.join(md, "l_returnflag").select(
        "l_returnflag", "median_qty", "mode_status", "n_rows"
    )


# --- width_bucket histogram --------------------------------------------------

_HIST_LO, _HIST_HI, _HIST_N = 900.0, 105000.0, 20

# DuckDB (this build) has no width_bucket; the oracle mirrors Spark's
# exact WidthBucket formula — floor(n * (v - lo) / (hi - lo)) + 1 with
# underflow -> 0 and v >= hi -> n + 1 — in the same operand order, so the
# boundary doubles round identically.
_HISTOGRAM_ORACLE = f"""
SELECT CASE WHEN l_extendedprice < {_HIST_LO} THEN 0
            WHEN l_extendedprice >= {_HIST_HI} THEN {_HIST_N + 1}
            ELSE CAST(FLOOR({_HIST_N}.0 * (l_extendedprice - {_HIST_LO})
                            / ({_HIST_HI} - {_HIST_LO})) AS BIGINT) + 1
       END AS bucket,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM lineitem
GROUP BY bucket
"""


@query("agg_histogram_width_bucket", oracle=_HISTOGRAM_ORACLE, tags=("agg",))
def agg_histogram_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via the SQL-standard width_bucket: bucket
    assignment is a row-local expression inside the scan stage, so the
    whole histogram is one partial+final aggregate over <= n_buckets + 2
    keys — the cheapest possible distribution profile at any scale
    (underflow -> bucket 0, overflow -> n+1, per the standard)."""
    (li,) = load(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.width_bucket(
                "l_extendedprice", F.lit(_HIST_LO), F.lit(_HIST_HI), F.lit(_HIST_N)
            ).alias("bucket"),
            "l_extendedprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_price"),
        )
    )


# --- try_* safe arithmetic ---------------------------------------------------

_TRY_ORACLE = """
SELECT o_orderkey,
       TRY_CAST(o_orderpriority AS INTEGER) AS pri_num,
       TRY_CAST(o_orderkey % 300 AS TINYINT) AS small_key,
       o_totalprice / NULLIF(o_custkey % 5, 0) AS price_ratio,
       string_split(o_orderpriority, '-')[3] AS third_token
FROM orders
"""


@query("scalar_try_arith", oracle=_TRY_ORACLE, tags=("scalar", "errors"))
def scalar_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-on-failure expression surface: try_cast (malformed string,
    integer overflow), try_divide (zero denominator), try_element_at
    (out-of-bounds). All row-local codegen'd expressions — the
    error-tolerant path costs nothing over the throwing path, which is
    why a 100 TB pipeline uses try_* + a dead-letter filter instead of
    job-killing exceptions (the engine-side analogue of the reference's
    io-ts decode-or-Left, src/config/ioConfig.ts:5-13)."""
    (orders,) = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.expr("try_cast(o_orderpriority AS INT)").alias("pri_num"),
        F.expr("try_cast(o_orderkey % 300 AS TINYINT)").alias("small_key"),
        F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 5).alias(
            "price_ratio"
        ),
        F.try_element_at(F.split("o_orderpriority", "-"), F.lit(3)).alias(
            "third_token"
        ),
    )


# --- ordered string aggregation ----------------------------------------------

_STRING_AGG_ORACLE = """
WITH d AS (
  SELECT DISTINCT c.c_mktsegment, o.o_orderstatus
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
),
agg AS (
  SELECT c_mktsegment,
         string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
  FROM d GROUP BY c_mktsegment
),
n AS (
  SELECT c.c_mktsegment, COUNT(*) AS n_orders
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment
)
SELECT a.c_mktsegment, a.statuses, n.n_orders
FROM agg a JOIN n ON n.c_mktsegment = a.c_mktsegment
"""


@query("agg_string_agg_ordered", oracle=_STRING_AGG_ORACLE, tags=("agg", "string"))
def agg_string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ordered string aggregation: collect_set -> sort_array
    -> array_join gives an order-insensitive, duplicate-free result no
    matter how partitions arrive (collect_list would be partition-order
    dependent — never hashable cross-engine). The fact-side join is a
    broadcast (customer segment dim is small relative to orders at any
    scale ratio here) and the set per group is bounded by the value
    domain, not the row count."""
    customer, orders = load(spark, sf_dir, "customer", "orders")
    # customer is corpus-scaled: estimate-driven strategy, no broadcast
    # force (r12 audit — a force never flips, so it would ship an
    # arbitrarily large relation at 100 TB)
    joined = orders.join(
        customer.select("c_custkey", "c_mktsegment"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",").alias(
            "statuses"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --- posexplode with ordinals ------------------------------------------------

_POSEXPLODE_ORACLE = """
WITH tok AS (
  SELECT p_partkey, string_split(p_name, ' ') AS w FROM part
)
SELECT p_partkey, i - 1 AS pos, w[i] AS word
FROM tok, UNNEST(range(1, least(len(w), 3) + 1)) t(i)
"""


@query("scalar_posexplode_ordinal", oracle=_POSEXPLODE_ORACLE, tags=("scalar", "lateral"))
def scalar_posexplode_ordinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral expansion with ordinals: posexplode over a bounded slice of
    the token array (first 3 words). Generators run inside the scan stage
    (no shuffle at all); bounding the slice keeps the fan-out constant per
    row — the pattern for prefix features at corpus scale."""
    (part,) = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.posexplode(F.slice(F.split("p_name", " "), 1, 3)).alias("pos", "word"),
    )


# --- VARIANT semi-structured access ------------------------------------------

_VARIANT_ORACLE = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       COUNT(json_extract_string(props, '$.missing')) AS n_missing_hits
FROM events
GROUP BY event_type
"""


@query("events_variant_extract", oracle=_VARIANT_ORACLE, tags=("scalar", "variant"))
def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the VARIANT type (Spark 4): props
    parses ONCE into the binary-JSON variant encoding, then typed paths
    read fields without re-tokenizing the string — the engine-native
    upgrade over per-path get_json_object re-parsing (and the columnar
    answer to the reference's JSON.parse-per-event at
    src/database/postgresql/PostgresLogicalPg.ts:21). try_variant_get on
    an absent path yields NULL instead of an error, mirroring the io-ts
    decode-or-Left contract."""
    (events,) = load(spark, sf_dir, "events")
    v = events.select(
        "event_type",
        F.parse_json("props").alias("pv"),
    ).select(
        "event_type",
        F.variant_get("pv", "$.k", "bigint").alias("k"),
        F.try_variant_get("pv", "$.missing", "string").alias("missing"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.count("missing").alias("n_missing_hits"),
    )


# --- grouped-aggregate pandas UDF --------------------------------------------

_GROUPED_AGG_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS mean_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""


@query("udf_pandas_grouped_agg", oracle=_GROUPED_AGG_ORACLE, tags=("udf", "agg"))
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF — the vectorized UDAF surface (the fourth
    Python-extension shape next to scalar pandas UDF, grouped-map
    applyInPandas, and UDTF in queries/udfs.py).

    Each group's values arrive as ONE pandas Series (Arrow-batched);
    Spark runs it as a real aggregate, so it composes with groupBy and
    partial shuffle like built-ins (final-only: Python aggregates do not
    partial-combine — the reason built-ins stay preferred in hot paths,
    documented tradeoff). Determinism: the values are integers-as-doubles,
    so the float sum is order-independent and the mean is exact on both
    engines."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _mean_qty(v):
        return float(v.sum() / len(v))

    # real annotation objects, not strings: this module's `from __future__
    # import annotations` would stringify inline hints, and pandas_udf
    # infers SERIES_TO_SCALAR (grouped agg) from the live types
    _mean_qty.__annotations__ = {"v": pd.Series, "return": float}
    mean_qty = pandas_udf("double")(_mean_qty)

    def _n(v):
        return len(v)

    _n.__annotations__ = {"v": pd.Series, "return": int}
    n_rows = pandas_udf("long")(_n)

    # Spark forbids mixing grouped-agg pandas UDFs with non-pandas
    # aggregates in one agg() — so the count is a pandas aggregate too.
    (li,) = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        mean_qty("l_quantity").alias("mean_qty"),
        n_rows("l_quantity").alias("n"),
    )


# --- boolean / conditional aggregates ----------------------------------------

_BOOL_AGG_ORACLE = """
SELECT o_orderpriority,
       CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
       bool_and(o_totalprice > 0) AS all_positive,
       bool_or(o_orderstatus = 'P') AS any_pending,
       CAST(count_if(o_orderstatus = 'F') AS BIGINT) = COUNT(*) AS all_finished
FROM orders
GROUP BY o_orderpriority
"""


@query("agg_boolean_predicates", oracle=_BOOL_AGG_ORACLE, tags=("agg", "boolean"))
def agg_boolean_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate aggregation surface: count_if / bool_and / bool_or —
    the data-quality-assertion aggregates ("all rows positive", "any
    pending"). All partial-combinable built-ins: the shuffle carries one
    (count, bool, bool, count) tuple per group per partition."""
    (orders,) = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderstatus") == "P").alias("any_pending"),
        (F.count_if(F.col("o_orderstatus") == "F") == F.count(F.lit(1))).alias(
            "all_finished"
        ),
    )


# --- weighted median ----------------------------------------------------------
# The estimator behind revenue-weighted SLAs and sample-weight corrected
# statistics: the smallest value whose CUMULATIVE weight reaches half
# the group total (lower weighted median — a deterministic, exactly
# mirrorable definition, unlike interpolating variants). One sort-window
# per group over (value, tiebreak) with a running decimal weight sum,
# one broadcast of the per-group totals, and a per-group argmin — the
# same shape as the sessionize/frame windows, no extra scan.

_WMEDIAN_ORACLE = """
WITH w AS (
  SELECT o_orderpriority AS grp, o_totalprice AS v,
         CAST(1 + o_custkey % 5 AS BIGINT) AS wt,
         o_orderkey AS tb
  FROM orders
),
cum AS (
  SELECT grp, v, wt, tb,
         SUM(wt) OVER (PARTITION BY grp ORDER BY v, tb
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         SUM(wt) OVER (PARTITION BY grp) AS total
  FROM w
)
SELECT grp AS o_orderpriority,
       MIN(v) AS weighted_median,
       CAST(MAX(total) AS BIGINT) AS total_weight
FROM cum
WHERE cw * 2 >= total
GROUP BY grp
"""


@query("agg_weighted_median", oracle=_WMEDIAN_ORACLE,
       tags=("agg", "percentile", "weighted"))
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lower weighted median of order totalprice per priority, weights
    derived arithmetically (1 + custkey % 5): the first value whose
    running weight reaches half the group's total. Integer weights, so
    the threshold compare (2*cum >= total) is exact."""
    from pyspark.sql import Window

    (orders,) = load(spark, sf_dir, "orders")
    w = orders.select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").alias("v"),
        (1 + F.col("o_custkey") % 5).cast("long").alias("wt"),
        F.col("o_orderkey").alias("tb"),
    )
    cum_w = (
        Window.partitionBy("grp").orderBy("v", "tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy("grp")
    cum = w.select(
        "grp", "v",
        F.sum("wt").over(cum_w).alias("cw"),
        F.sum("wt").over(tot_w).alias("total"),
    )
    return (
        cum.filter(F.col("cw") * 2 >= F.col("total"))
        .groupBy(F.col("grp").alias("o_orderpriority"))
        .agg(
            F.min("v").alias("weighted_median"),
            F.max("total").cast("long").alias("total_weight"),
        )
    )


# --- collation-aware comparison semantics (Spark 4 COLLATE) -------------------
# Spark 4's collation engine makes case policy a TYPE property instead
# of a per-expression lower() wrap: grouping, equality, and joins under
# `COLLATE UTF8_LCASE` compare case-insensitively inside codegen'd
# comparators (no normalized shadow column materialized, and at 100 TB
# no second string copy shuffled). The fixture case-mangles
# c_mktsegment three ways by key, groups by the COLLATED value, and
# counts collated-equality hits against a default-collation literal
# (implicit coercion adopts the stronger collation). Output emits
# lower(group) because the engine may surface ANY case representative
# per group — the collation defines equivalence classes, not canonical
# forms — and the oracle mirrors the classes with lower() (for
# case-insensitive ASCII collations the classes coincide; richer ICU
# collations like UNICODE_AI have no DuckDB mirror and stay out of the
# gate).

_COLLATION_ORACLE = """
WITH m AS (
  SELECT CASE WHEN c_custkey % 3 = 0 THEN upper(c_mktsegment)
              WHEN c_custkey % 3 = 1 THEN lower(c_mktsegment)
              ELSE c_mktsegment END AS seg
  FROM customer
)
SELECT lower(seg) AS segment,
       COUNT(*) AS n_rows,
       COUNT(CASE WHEN lower(seg) = 'building' THEN 1 END) AS n_eq_building
FROM m
GROUP BY lower(seg)
"""


@query("scalar_collation_groupby", oracle=_COLLATION_ORACLE,
       tags=("scalar", "collation", "sql"))
def scalar_collation_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    (customer,) = load(spark, sf_dir, "customer")
    seg = (
        F.when(F.col("c_custkey") % 3 == 0, F.upper("c_mktsegment"))
        .when(F.col("c_custkey") % 3 == 1, F.lower("c_mktsegment"))
        .otherwise(F.col("c_mktsegment"))
    )
    m = customer.select(seg.alias("seg"))
    return (
        m.groupBy(F.expr("seg COLLATE UTF8_LCASE").alias("segc"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(
                F.when(
                    F.expr("seg COLLATE UTF8_LCASE") == F.lit("building"), 1
                )
            ).alias("n_eq_building"),
        )
        .select(F.lower("segc").alias("segment"), "n_rows", "n_eq_building")
    )
