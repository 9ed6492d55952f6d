"""The remaining TPC-H plan shapes (q2, q9, q11, q13, q15, q16, q17, q20,
q21, q22), adapted to the driver star schema (TESTDATA.md has no partsupp
table and no l_commitdate/l_receiptdate, so cost/availability/lateness are
re-expressed over the columns that exist while keeping each query's
distinctive plan shape intact).

The reference pushes all analytical SQL upstream verbatim
(src/database/postgresql/PostgresPg.ts:5-14); here each shape is declared
with the DataFrame API and Catalyst owns decorrelation and join selection:

- q2: correlated scalar max -> aggregate-then-join-back (the decorrelated
  plan Catalyst/DuckDB both produce);
- q9: multi-dim star join with a computed profit measure;
- q11: group-sum filtered by a scalar fraction of the global sum;
- q13: outer join with an ON-clause filter, then a two-level aggregation;
- q15: aggregate CTE reused for both the ranking and the max;
- q16: anti-join (NOT IN) + multi-key COUNT DISTINCT;
- q17: correlated per-key average threshold -> agg-join-back;
- q20: nested semi-join chain over a group-having inner;
- q21: EXISTS + NOT EXISTS self-joins on the fact table (semi + anti);
- q22: scalar-average gate + anti join, grouped on a derived code.

100 TB posture: dims broadcast; the only fact-fact self-joins (q21) reuse
one shuffle key (l_orderkey); per-key thresholds (q17) broadcast their
(small) agg side; scalar gates (q11, q22) broadcast a 1-row frame.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from . import query
from .relational import _dsum

# --- Q2 shape: best supplier per nation (correlated scalar max) --------------

_Q2_ORACLE = """
SELECT s.s_name, n.n_name, CAST(s.s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'EUROPE'
  AND s.s_acctbal = (
    SELECT MAX(s2.s_acctbal) FROM supplier s2
    WHERE s2.s_nationkey = s.s_nationkey
  )
ORDER BY s.s_name
"""


@query("q2_best_supplier", oracle=_Q2_ORACLE, tags=("tpch", "subquery", "join"))
def q2_best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated MAX decorrelated by hand: one agg over supplier keyed by
    nation, broadcast back against supplier. Exact-double equality is safe
    because both sides carry the same stored value."""
    supp, nation, region = load(spark, sf_dir, "supplier", "nation", "region")
    best = supp.groupBy(F.col("s_nationkey").alias("b_nk")).agg(
        F.max("s_acctbal").alias("b_max")
    )
    euro_nations = nation.join(
        # bounded: filtered region dim
        F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    return (
        supp.join(F.broadcast(best),
                  (F.col("s_nationkey") == F.col("b_nk"))
                  & (F.col("s_acctbal") == F.col("b_max")))
        .join(F.broadcast(euro_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
        .orderBy("s_name")
    )


# --- Q9 shape: profit by nation and year over a 5-way star -------------------
# No ps_supplycost in the schema: cost proxied as 10% of p_retailprice per
# unit, which keeps the measure a cross-table arithmetic expression.

_Q9_ORACLE = """
SELECT nation, o_year,
       CAST(SUM(CAST(amount AS DECIMAL(22,6))) AS DOUBLE) AS sum_profit
FROM (
  SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount)
           - 0.1 * p.p_retailprice * l.l_quantity AS amount
  FROM lineitem l
  JOIN part p     ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '%red%'
)
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@query("q9_profit_by_nation", oracle=_Q9_ORACLE, tags=("tpch", "join", "agg"))
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part, supp, orders, nation = load(
        spark, sf_dir, "lineitem", "part", "supplier", "orders", "nation"
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        # filtered part / supplier are corpus-scaled: no force (r12)
        li.join((part.filter(F.col("p_name").like("%red%"))
                            .select("p_partkey", "p_retailprice")),
                F.col("p_partkey") == F.col("l_partkey"))
        .join(supp.select("s_suppkey", "s_nationkey"),
              F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        # bounded: 25-nation dim
        .join(F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("nation"))),
              F.col("n_nationkey") == F.col("s_nationkey"))
        .select("nation", F.year("o_orderdate").alias("o_year"), amount.alias("amount"))
        .groupBy("nation", "o_year")
        .agg(_dsum(F.col("amount"), "22,6").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# --- Q11 shape: important line value (scalar fraction of global sum) ---------

_Q11_FRACTION = "0.002"

_Q11_ORACLE = f"""
WITH val AS (
  SELECT l.l_partkey,
         SUM(CAST(l.l_extendedprice * l.l_quantity AS DECIMAL(22,6))) AS v
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_7'
  GROUP BY l.l_partkey
)
SELECT l_partkey, CAST(v AS DOUBLE) AS value
FROM val
WHERE v > (SELECT CAST(SUM(v) * {_Q11_FRACTION} AS DECIMAL(22,6)) FROM val)
ORDER BY value DESC, l_partkey
"""


@query("q11_important_value", oracle=_Q11_ORACLE, tags=("tpch", "subquery", "agg"))
def q11_important_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HAVING threshold is a scalar over the same aggregate: computed
    once and broadcast as a 1-row cross join (exact decimals end-to-end so
    the > comparison is engine-independent)."""
    li, supp, nation = load(spark, sf_dir, "lineitem", "supplier", "nation")
    nation7 = nation.filter(F.col("n_name") == "NATION_7").select("n_nationkey")
    val = (
        # supplier slice is corpus-scaled (1 of 25 nations): no outer force
        # bounded: nation7 is a fixed single-nation dim slice (r12)
        li.join(supp.join(F.broadcast(nation7),
                          F.col("s_nationkey") == F.col("n_nationkey"))
                    .select("s_suppkey"),
                F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum((F.col("l_extendedprice") * F.col("l_quantity"))
                   .cast("decimal(22,6)")).alias("v"))
    )
    # Multiply by an exact decimal literal so the product stays in decimal
    # arithmetic (decimal x double would promote to DOUBLE and a value
    # within double rounding error of the threshold could flip engines).
    threshold = val.agg(
        (F.sum("v") * F.expr(f"CAST({_Q11_FRACTION} AS DECIMAL(6,4))"))
        .cast("decimal(22,6)").alias("t")
    )
    return (
        # bounded: 1-row aggregate
        val.join(F.broadcast(threshold))
        .filter(F.col("v") > F.col("t"))
        .select("l_partkey", F.col("v").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), "l_partkey")
    )


# --- Q13 shape: customer order-count distribution ----------------------------

_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("q13_customer_distribution", oracle=_Q13_ORACLE, tags=("tpch", "outer", "agg"))
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level agg: the first shuffles on c_custkey (count per customer,
    outer join keeps order-less customers as count 0); the second groups
    the tiny distribution — its shuffle moves |distinct counts| rows."""
    cust, orders = load(spark, sf_dir, "customer", "orders")
    per_cust = (
        cust.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT")
            .select("o_custkey", "o_orderkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --- Q15 shape: top supplier (aggregate CTE + scalar max over it) ------------

_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""


@query("q15_top_supplier", oracle=_Q15_ORACLE, tags=("tpch", "subquery", "agg"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimal revenue makes the = MAX() equality exact. The revenue frame
    is small (|suppliers| rows), so both the max and the final join
    broadcast; lineitem is scanned once per branch with pushed date
    filters (AQE reuses the exchange when beneficial)."""
    li, supp = load(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                   .cast("decimal(22,6)")).alias("total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        # revenue is one row PER SUPPLIER (corpus-scaled agg): no force;
        # bounded: top is a 1-row aggregate (r12)
        supp.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(top), F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name",
                F.col("total_revenue").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


# --- Q16 shape: supplier counts by part attrs (NOT IN + count distinct) ------

_Q16_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#3'
  AND p.p_type NOT IN ('PROMO', 'ECONOMY')
  AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""


@query("q16_supplier_part_counts", oracle=_Q16_ORACLE, tags=("tpch", "anti", "agg"))
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a non-null key = left anti join (broadcast: the excluded
    supplier set is tiny). COUNT DISTINCT is Spark's two-phase expand —
    partials move (group, suppkey) pairs, not rows."""
    li, part, supp = load(spark, sf_dir, "lineitem", "part", "supplier")
    wanted = part.filter(
        (F.col("p_brand") != "Brand#3")
        & ~F.col("p_type").isin("PROMO", "ECONOMY")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    negative = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        # negative-balance suppliers and the brand-filtered part set are
        # corpus-scaled slices: estimate-driven strategy, no force (r12)
        li.join(negative,
                F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(wanted, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# --- Q17 shape: small-quantity revenue (correlated per-key average) ----------

_Q17_ORACLE = """
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(22,6))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#11'
  AND l.l_quantity < (
    SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                  / COUNT(*))
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
  )
"""


@query("q17_small_qty_revenue", oracle=_Q17_ORACLE, tags=("tpch", "subquery", "agg"))
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated AVG decorrelated to a per-partkey aggregate joined back.
    The threshold is exact-decimal-sum / count in DOUBLE on both engines,
    so the < comparison is bit-deterministic. brand_parts and the
    per-part threshold table are corpus-scaled slices (|brand parts|
    rows), so neither is forced into a broadcast — AQE broadcasts them
    from measured runtime size while they fit (r12 audit)."""
    li, part = load(spark, sf_dir, "lineitem", "part")
    brand_parts = part.filter(F.col("p_brand") == "Brand#11").select("p_partkey")
    per_part = (
        li.join(brand_parts,
                F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg(
            (F.lit(0.5)
             * (F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1)))).alias("qty_threshold")
        )
    )
    return (
        li.join(brand_parts,
                F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(per_part, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((_dsum(F.col("l_extendedprice"), "22,6") / 7.0).alias("avg_yearly"))
    )


# --- Q20 shape: heavy shippers of small parts (nested semi-join chain) -------

_Q20_QTY = "200"

_Q20_ORACLE = f"""
SELECT s.s_name, CAST(s.s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  WHERE l.l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
        )
    AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l.l_suppkey
  HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,4))) > {_Q20_QTY}
)
ORDER BY s.s_name
"""


@query("q20_heavy_shippers", oracle=_Q20_ORACLE, tags=("tpch", "semi", "having"))
def q20_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery chain as two stacked left-semi joins: part filter prunes
    lineitem via broadcast semi, the group-having result (|suppliers| rows)
    broadcast-semi-filters supplier. Fact table never re-shuffles."""
    li, part, supp = load(spark, sf_dir, "lineitem", "part", "supplier")
    small_parts = part.filter(F.col("p_name").like("small%")).select("p_partkey")
    heavy = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        # small_parts is a corpus-scaled part slice: no force (r12)
        .join(small_parts,
              F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("total_qty"))
        .filter(F.col("total_qty") > int(_Q20_QTY))
        .select("l_suppkey")
    )
    return (
        # heavy is one row per qualifying supplier (corpus-scaled): no force
        supp.join(heavy,
                  F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
        .orderBy("s_name")
    )


# --- Q21 shape: sole late supplier (EXISTS + NOT EXISTS self-joins) ----------
# No l_receiptdate/l_commitdate in the schema: "late" is re-expressed as
# shipping >60 days after the order date on a failed ('F') order.

_Q21_ORACLE = """
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
SELECT s.s_name, COUNT(*) AS numwait
FROM late l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 100
"""


@query("q21_sole_late_supplier", oracle=_Q21_ORACLE, tags=("tpch", "semi", "anti"))
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS -> left semi, NOT EXISTS -> left anti, both self-joins keyed
    on l_orderkey: one shuffle key serves the whole chain, so at scale the
    three fact passes co-partition and AQE can reuse the exchange."""
    li, orders, supp = load(spark, sf_dir, "lineitem", "orders", "supplier")
    late = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(F.col("l_orderkey").alias("o2_orderkey"),
                       F.col("l_suppkey").alias("o2_suppkey"))
    late_others = late.select(F.col("l_orderkey").alias("o3_orderkey"),
                              F.col("l_suppkey").alias("o3_suppkey"))
    sole = (
        late.join(
            others,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
    )
    return (
        # supplier is corpus-scaled: no force (r12)
        sole.join(supp.select("s_suppkey", "s_name"),
                  F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


# --- Q22 shape: dormant high-balance customers (scalar avg + anti join) ------
# No phone column: the "country code" is the last-two-digits slice of
# c_name ('Customer#000000123' -> positions 17-18), which distributes
# uniformly across 00-99. Dormant = no order since 2000-01-01 (every
# customer has *some* order in this dataset, so the literal TPC-H
# "no orders at all" would be vacuously empty).

_Q22_CODES = ("10", "17", "23", "29", "30", "31", "35")
_Q22_CODES_SQL = ", ".join(f"'{c}'" for c in _Q22_CODES)

_Q22_ORACLE = f"""
WITH eligible AS (
  SELECT SUBSTRING(c_name, 17, 2) AS cntrycode, c_custkey, c_acctbal
  FROM customer
  WHERE SUBSTRING(c_name, 17, 2) IN ({_Q22_CODES_SQL})
)
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
FROM eligible e
WHERE e.c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
    FROM eligible WHERE c_acctbal > 0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = e.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  )
GROUP BY cntrycode
ORDER BY cntrycode
"""


@query("q22_dormant_customers", oracle=_Q22_ORACLE, tags=("tpch", "anti", "subquery"))
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar average gate broadcasts as a 1-row cross join (exact
    decimal sum / count -> identical double on both engines); NOT EXISTS
    is a left anti against orders' key column only."""
    cust, orders = load(spark, sf_dir, "customer", "orders")
    eligible = cust.withColumn("cntrycode", F.substring("c_name", 17, 2)).filter(
        F.col("cntrycode").isin(*_Q22_CODES)
    )
    avg_bal = eligible.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double")
         / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        # bounded: 1-row aggregate
        eligible.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.filter(
                F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
            ).select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
            .cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
