"""Additional TPC-H-shaped analytical queries (SURVEY.md §2.2 relational
breadth) adapted to the driver's star schema (TESTDATA.md columns).

Each exercises a distinct plan shape the reference delegates wholesale to
PostgreSQL (src/database/postgresql/PostgresPg.ts:5-14 pushes literal SQL
upstream; here Catalyst owns the plan):

- q4 shape: EXISTS decorrelated to a left-semi join, then agg;
- q6 shape: single-scan global agg, every predicate pushed to parquet;
- q12 shape: join + CASE-conditional counts;
- q14 shape: broadcast join + conditional revenue share;
- q18 shape: group-having on the fact table, then join back to dims;
- q19 shape: disjunction of conjunctive brackets over a broadcast join.

100 TB posture: every dim side (part, orders at q18's post-having size) is
broadcast; the lineitem scans carry pushed filters and pruned columns; aggs
are partial map-side so shuffles move |groups|, not |rows|.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from . import query
from .relational import _dsum

# --- Q4 shape: order-priority checking via EXISTS (semi join) ----------------

_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q4_order_priority", oracle=_Q4_ORACLE, tags=("tpch", "semi", "agg"))
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, li = load(spark, sf_dir, "orders", "lineitem")
    window = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    late = window.join(
        li,
        (li["l_orderkey"] == window["o_orderkey"])
        & (li["l_shipdate"] > window["o_orderdate"]),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- Q6 shape: forecasting revenue change (pure scan-side agg) ---------------

_Q6_ORACLE = """
SELECT
  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(22,6))) AS DOUBLE)
    AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@query("q6_revenue_forecast", oracle=_Q6_ORACLE, tags=("tpch", "agg", "pushdown"))
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every predicate here reaches the parquet scan (min/max row-group
    skipping on l_shipdate at scale); the agg is a single partial+final
    pair moving one row per partition."""
    (li,) = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_dsum(F.col("l_extendedprice") * F.col("l_discount"), "22,6").alias("revenue"))
    )


# --- Q12 shape: shipping priority classes per return flag --------------------

_Q12_ORACLE = """
SELECT
  l.l_returnflag,
  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""


@query("q12_priority_classes", oracle=_Q12_ORACLE, tags=("tpch", "join", "agg"))
def q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, li = load(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .join(orders.select("o_orderkey", "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# --- Q14 shape: promotion revenue share (conditional agg over join) ----------

_Q14_ORACLE = """
SELECT
  CAST(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
        THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(22,6))
        ELSE CAST(0 AS DECIMAL(22,6)) END) AS DOUBLE)
  / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(22,6)))
         AS DOUBLE) AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
"""


@query("q14_promo_share", oracle=_Q14_ORACLE, tags=("tpch", "join", "agg"))
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = load(spark, sf_dir, "lineitem", "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(22,6)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(22,6)"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
        )
        .join(F.broadcast(part.select("p_partkey", "p_type")),
              F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.lit(100.0) * F.sum(promo).cast("double")
             / F.sum(rev).cast("double")).alias("promo_revenue_pct")
        )
    )


# --- Q18 shape: large-volume orders (group-having then join back) ------------

_Q18_QTY = 140

_Q18_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > {_Q18_QTY}
)
SELECT
  c.c_name, o.o_orderkey, o.o_orderdate,
  CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
  CAST(b.total_qty AS DOUBLE) AS total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
"""


@query("q18_large_orders", oracle=_Q18_ORACLE, tags=("tpch", "having", "topk"))
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The agg runs on the fact table FIRST (shuffle on l_orderkey moves
    partial sums only); the post-having survivor set is tiny, so both
    subsequent joins broadcast it against the dims — no fact re-shuffle."""
    li, orders, cust = load(spark, sf_dir, "lineitem", "orders", "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("total_qty"))
        .filter(F.col("total_qty") > _Q18_QTY)
    )
    return (
        F.broadcast(big)
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "o_orderkey", "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# --- Q19 shape: disjunctive bracket predicates over a broadcast join ---------

_Q19_ORACLE = """
SELECT
  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(22,6)))
       AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE
  (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
   AND l.l_quantity >= 1 AND l.l_quantity <= 21)
  OR
  (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 25
   AND l.l_quantity >= 10 AND l.l_quantity <= 30)
  OR
  (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 35
   AND l.l_quantity >= 20 AND l.l_quantity <= 40)
"""


@query("q19_disjunctive_brackets", oracle=_Q19_ORACLE, tags=("tpch", "join", "filter"))
def q19_disjunctive_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst extracts the common l_partkey equi-key so this stays a hash
    join (not BNLJ) with the OR brackets as a post-join filter; the
    p_brand/p_size arms also push to the broadcast side's scan."""
    li, part = load(spark, sf_dir, "lineitem", "part")
    j = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    bracket = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#22") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 40))
    )
    return j.filter(bracket).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "22,6").alias("revenue")
    )
