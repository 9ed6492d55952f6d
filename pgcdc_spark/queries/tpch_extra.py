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
        # part is corpus-scaled: estimate-driven strategy, no force (r12)
        .join(part.select("p_partkey", "p_type"),
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
    # the survivor set is selective but CORPUS-SCALED (a fixed
    # selectivity fraction of orders), so no broadcast FORCE: AQE
    # broadcasts it from its measured runtime size while that fits and
    # falls back to a shuffled join when it no longer does (r12 audit)
    return (
        big
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
    # part is corpus-scaled: estimate-driven strategy, no force (r12)
    j = li.join(part, F.col("p_partkey") == F.col("l_partkey"))
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


# --- Q7 shape: bilateral volume shipping between two nations -----------------
# Five-way star join where BOTH fact FKs (l_suppkey via supplier,
# o_custkey via customer) resolve to the same broadcast nation dim under
# different roles. The nation-pair disjunction filters the dims BEFORE the
# fact join, so at 100 TB the lineitem scan joins against two ~1-row
# broadcast sides and the shuffle moves only surviving (nation-pair) rows.

_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(volume AS DECIMAL(22,6))) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l.l_shipdate) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY supp_nation, cust_nation, l_year
"""


@query("q7_volume_shipping", oracle=_Q7_ORACLE, tags=("tpch", "join", "agg"))
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust, supp, nation = load(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    pair = ("NATION_1", "NATION_2")
    n1 = nation.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        # supplier is corpus-scaled: no force
        # bounded: n1/n2 are fixed 25-row nation dims
        .join(supp.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(cust.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.select(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_dsum(F.col("volume"), "22,6").alias("revenue"))
    )


# --- Q8 shape: national market share within a region -------------------------
# The share is a ratio of two conditional aggregates over the same joined
# stream (one pass, no self-join): numerator = volume where the supplier
# nation is the target, denominator = all volume in the region/type slice.

_Q8_ORACLE = """
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                     THEN CAST(volume AS DECIMAL(22,6)) ELSE 0 END) AS DOUBLE)
         / CAST(SUM(CAST(volume AS DECIMAL(22,6))) AS DOUBLE) AS mkt_share
FROM (
  SELECT year(o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n1.n_name AS supp_nation
  FROM lineitem l
  JOIN part p     ON l.l_partkey = p.p_partkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  JOIN region r   ON n2.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  WHERE r.r_name = 'ASIA'
    AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY o_year
"""


@query("q8_market_share", oracle=_Q8_ORACLE, tags=("tpch", "join", "agg"))
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part, orders, cust, supp, nation, region = load(
        spark, sf_dir,
        "lineitem", "part", "orders", "customer", "supplier", "nation", "region",
    )
    asia_nations = (
        nation.join(
            # bounded: filtered region dim
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select(F.col("n_nationkey").alias("c_nk"))
    )
    joined = (
        # filtered part is still corpus-scaled: no force (r12)
        li.join(part.filter(F.col("p_type") == "ECONOMY")
                    .select("p_partkey"),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        # bounded: filtered nation dim
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("c_nk"))
        # supplier is corpus-scaled: no force; nation stays a broadcast dim
        .join(supp.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"),
                                      F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("s_nk"),
        )
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(22,6)")
    return (
        joined.select(
            F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "supp_nation"
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                    .otherwise(F.lit(0).cast("decimal(22,6)"))
                ).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
    )


# --- Q10 shape: returned-item reporting (top 20 customers by lost revenue) ---
# Group-by on a wide key (customer attributes ride along with the grouping
# key — cheaper than re-joining them after the agg at this cardinality),
# then a deterministic global top-k via TakeOrderedAndProject.

_Q10_ORACLE = """
SELECT c_custkey, c_name, revenue, c_acctbal, n_name
FROM (
  SELECT c.c_custkey, c.c_name,
         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                       AS DECIMAL(22,6))) AS DOUBLE) AS revenue,
         c.c_acctbal, n.n_name
  FROM customer c
  JOIN orders o   ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
    AND l.l_returnflag = 'R'
  GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
)
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q10_returned_items", oracle=_Q10_ORACLE, tags=("tpch", "join", "topk"))
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li, nation = load(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    joined = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        # bounded: 25-nation dim
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "22,6")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )
