"""Projection / filter / scalar-expression queries (SURVEY.md §2.2).

Covers the reference's R4 predicate filter and R5 projection semantics
(src/mapping/customMapper.ts:12-23) generalized to the full scalar surface:
CASE/WHEN, COALESCE/NULLIF, string, date, math functions. All expressions
are built-in ``pyspark.sql.functions`` — JVM-side, inside whole-stage
codegen; no Python UDFs in any hot path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import fan_out, load
from . import query

# ---------------------------------------------------------------------------
# Flagship: pricing summary (TPC-H Q1 shape) — scan, filter, hash agg, sort.
# Filter pushes to parquet; partial aggregation is map-side (Tungsten) so the
# shuffle carries only |groups| x partitions rows, invariant to data scale.
# ---------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(22,6))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def _dsum(col, prec: str = "18,4"):
    """Exact decimal sum emitted as double — deterministic on any engine."""
    return F.sum(col.cast(f"decimal({prec})")).cast("double")


@query("q1_pricing_summary", oracle=_Q1_ORACLE, tags=("agg", "flagship"))
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1)).cast("double")
    # Seven exact-decimal sums make this agg CPU-heavy per input byte, so
    # spread an under-split scan first (fan_out is a no-op when the input
    # already has >= parallelism splits — the 100 TB case). Decimal sums
    # are order-independent, so the result is unchanged.
    return (
        fan_out(li)
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price, "22,6").alias("sum_disc_price"),
            _dsum(charge, "22,6").alias("sum_charge"),
            (_dsum(F.col("l_quantity")) / n).alias("avg_qty"),
            (_dsum(F.col("l_extendedprice")) / n).alias("avg_price"),
            (_dsum(F.col("l_discount")) / n).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Projection + rich predicates: IN / BETWEEN / LIKE / IS NULL / rename / drop.
# Mirrors R4's tag-filter (customMapper.ts:12-13) over analytic data.
# ---------------------------------------------------------------------------

_PROJ_ORACLE = """
SELECT
  o_orderkey,
  o_custkey,
  o_totalprice,
  CAST(o_orderdate AS DATE) AS order_date,
  o_orderpriority AS priority
FROM orders
WHERE o_orderstatus IN ('O', 'F')
  AND o_totalprice BETWEEN 1000 AND 200000
  AND o_orderpriority LIKE '%URGENT%'
  AND o_custkey IS NOT NULL
"""


@query("proj_filter_predicates", oracle=_PROJ_ORACLE, tags=("filter", "project"))
def proj_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    return (
        orders.filter(
            F.col("o_orderstatus").isin("O", "F")
            & F.col("o_totalprice").between(1000, 200000)
            & F.col("o_orderpriority").like("%URGENT%")
            & F.col("o_custkey").isNotNull()
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.col("o_orderpriority").alias("priority"),
        )
    )


# ---------------------------------------------------------------------------
# CASE/WHEN + COALESCE + NULLIF (null-safe projection — R5 done right:
# the reference silently drops rows with null images, customMapper.ts:19).
# ---------------------------------------------------------------------------

_CASE_ORACLE = """
SELECT
  c_custkey,
  CASE
    WHEN c_acctbal < 0 THEN 'debit'
    WHEN c_acctbal < 5000 THEN 'mid'
    ELSE 'prime'
  END AS bal_band,
  COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment,
  CAST(GREATEST(c_acctbal, 0.0) AS DOUBLE) AS bal_floor,
  CAST(LEAST(c_acctbal, 1000.0) AS DOUBLE) AS bal_cap
FROM customer
"""


@query("case_when_coalesce", oracle=_CASE_ORACLE, tags=("scalar",))
def case_when_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    (cust,) = load(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debit")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("prime")
        .alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "segment"
        ),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).cast("double").alias("bal_floor"),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).cast("double").alias("bal_cap"),
    )


# ---------------------------------------------------------------------------
# String functions.
# ---------------------------------------------------------------------------

_STR_ORACLE = """
SELECT
  p_partkey,
  LOWER(p_name) AS name_lower,
  UPPER(p_brand) AS brand_upper,
  SUBSTRING(p_type, 1, 6) AS type_prefix,
  TRIM(CONCAT('  ', p_name, '  ')) AS name_trim,
  LENGTH(p_name) AS name_len,
  REPLACE(p_brand, 'Brand#', 'B') AS brand_short,
  REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS brand_num,
  CONCAT_WS('/', p_brand, p_type) AS brand_type,
  LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
  CASE WHEN p_name LIKE '%a%' THEN STRPOS(p_name, 'a') ELSE 0 END AS first_a
FROM part
WHERE p_size >= 25
"""


@query("scalar_string_fns", oracle=_STR_ORACLE, tags=("scalar", "string"))
def scalar_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = load(spark, sf_dir, "part")
    return part.filter(F.col("p_size") >= 25).select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 6).alias("type_prefix"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trim"),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_replace(F.col("p_brand"), "Brand#", "B").alias("brand_short"),
        F.regexp_extract(F.col("p_brand"), "([0-9]+)", 1).alias("brand_num"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.when(F.col("p_name").like("%a%"), F.instr(F.col("p_name"), "a"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("first_a"),
    )


# ---------------------------------------------------------------------------
# Date/time functions (on us-precision timestamps; outputs are dates/ints).
# ---------------------------------------------------------------------------

_DATE_ORACLE = """
SELECT
  o_orderkey,
  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
  CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS order_month,
  CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS order_day,
  CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS order_quarter,
  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
  CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
  DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
  STRFTIME(o_orderdate, '%Y-%m-%d') AS iso_day
FROM orders
WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
"""


@query("scalar_date_fns", oracle=_DATE_ORACLE, tags=("scalar", "date"))
def scalar_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.filter(d >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")).select(
        "o_orderkey",
        F.year(d).cast("long").alias("order_year"),
        F.month(d).cast("long").alias("order_month"),
        F.dayofmonth(d).cast("long").alias("order_day"),
        F.quarter(d).cast("long").alias("order_quarter"),
        F.date_add(d.cast("date"), 30).alias("due_date"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), d.cast("date")).cast("long").alias(
            "days_to_2002"
        ),
        F.date_format(d, "yyyy-MM-dd").alias("iso_day"),
    )


# ---------------------------------------------------------------------------
# Math functions. All inputs/outputs double or int — IEEE ops with fixed
# operand order are bit-deterministic across engines.
# ---------------------------------------------------------------------------

_MATH_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  ROUND(l_extendedprice, 1) AS price_round,
  ABS(l_discount - 0.05) AS disc_dev,
  CAST(FLOOR(l_quantity / 7) AS BIGINT) AS qty_div7,
  CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS price_kilo,
  (1.0 + l_tax) * (1.0 + l_tax) AS tax_sq,
  ROUND(LN(l_extendedprice + 1.0), 9) AS log_price,
  SQRT(l_quantity) AS qty_sqrt,
  CAST(((CAST(l_orderkey AS BIGINT) % 7) + 7) % 7 AS BIGINT) AS key_mod7,
  CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign
FROM lineitem
WHERE l_linenumber = 1 AND l_quantity > 45
"""


@query("scalar_math_fns", oracle=_MATH_ORACLE, tags=("scalar", "math"))
def scalar_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = load(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_linenumber") == 1) & (F.col("l_quantity") > 45)).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice"), 1).alias("price_round"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor(F.col("l_quantity") / 7).alias("qty_div7"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_kilo"),
        # pow/ln are libm-dependent in the last ulp across engines: pow(x,2)
        # is written as x*x (IEEE-exact) and ln rounded to 9 decimals.
        ((F.lit(1.0) + F.col("l_tax")) * (F.lit(1.0) + F.col("l_tax"))).alias("tax_sq"),
        F.round(F.log(F.col("l_extendedprice") + 1.0), 9).alias("log_price"),
        F.sqrt(F.col("l_quantity")).alias("qty_sqrt"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("long").alias("key_mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


# --- decimal cast + exact decimal arithmetic (SURVEY.md §2.2 scalar table) --
# disc_price/charge are exact DECIMAL products (scale 4+4=8 fits with no
# rounding), emitted as doubles: the double conversion of an exact decimal
# is correctly rounded on both engines, so values hash identically.

_DECIMAL_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  CAST(CAST(l_extendedprice AS DECIMAL(18,4))
       * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS disc_price,
  CAST(CAST(l_extendedprice AS DECIMAL(18,4))
       * (1 - CAST(l_discount AS DECIMAL(18,4)))
       * (1 + CAST(l_tax AS DECIMAL(18,4))) AS DOUBLE) AS charge,
  CAST(CAST(l_quantity AS DECIMAL(12,2)) AS VARCHAR) AS qty_dec_str
FROM lineitem
WHERE l_quantity >= 49
"""


@query("scalar_decimal_arith", oracle=_DECIMAL_ORACLE, tags=("scalar", "decimal"))
def scalar_decimal_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    tax = F.col("l_tax").cast("decimal(18,4)")
    return li.filter(F.col("l_quantity") >= 49).select(
        "l_orderkey",
        "l_linenumber",
        (price * (F.lit(1) - disc)).cast("double").alias("disc_price"),
        (price * (F.lit(1) - disc) * (F.lit(1) + tax)).cast("double").alias("charge"),
        F.col("l_quantity").cast("decimal(12,2)").cast("string").alias("qty_dec_str"),
    )
