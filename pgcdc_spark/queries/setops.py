"""Sort / limit / set-operation / dedup queries (SURVEY.md §2.2)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load
from . import query

# --- order by (multi-key, desc, nulls) + limit with unique tiebreak ---------

_TOPN_ORACLE = """
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
"""


@query("sort_limit_topn", oracle=_TOPN_ORACLE, tags=("sort", "limit"))
def sort_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    # orderBy+limit compiles to TakeOrderedAndProject: per-partition top-N
    # then a driver-side merge of N*partitions rows — no global sort shuffle.
    (orders,) = load(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


# --- union distinct ---------------------------------------------------------

_UNION_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
"""


@query("setop_union_distinct", oracle=_UNION_ORACLE, tags=("setop",))
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, supp = load(spark, sf_dir, "customer", "supplier")
    return (
        cust.select(F.col("c_nationkey").alias("nationkey"))
        .union(supp.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


# --- union by name (schema-aligned union) -----------------------------------

_UNION_NAME_ORACLE = """
SELECT entity_id, name, kind FROM (
  SELECT c_custkey AS entity_id, c_name AS name, 'customer' AS kind FROM customer
  UNION ALL
  SELECT s_suppkey AS entity_id, s_name AS name, 'supplier' AS kind FROM supplier
)
"""


@query("setop_union_by_name", oracle=_UNION_NAME_ORACLE, tags=("setop",))
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, supp = load(spark, sf_dir, "customer", "supplier")
    a = cust.select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("name"),
        F.lit("customer").alias("kind"),
    )
    # Deliberately different column order — unionByName must align by name.
    b = supp.select(
        F.lit("supplier").alias("kind"),
        F.col("s_name").alias("name"),
        F.col("s_suppkey").alias("entity_id"),
    )
    return a.unionByName(b)


# --- intersect / except -----------------------------------------------------

_INTERSECT_ORACLE = """
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
"""


@query("setop_intersect", oracle=_INTERSECT_ORACLE, tags=("setop",))
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_totalprice") > 250000).select(
        F.col("o_custkey").alias("custkey")
    )
    b = orders.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersect(b)


_EXCEPT_ORACLE = """
SELECT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
EXCEPT
SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
"""


@query("setop_except", oracle=_EXCEPT_ORACLE, tags=("setop",))
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Customers who ordered in 1995 but not 1996 — non-empty on the test
    # data, unlike customer-minus-orders (FKs have full coverage).
    # subtract() IS SQL EXCEPT (set semantics: drop a value if it appears
    # in b at all); exceptAll().distinct() would be wrong — multiset
    # except keeps values that are merely MORE frequent in a than in b.
    (orders,) = load(spark, sf_dir, "orders")
    a = orders.filter(F.year("o_orderdate") == 1995).select(
        F.col("o_custkey").alias("custkey")
    )
    b = orders.filter(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.subtract(b)


# --- distinct over expressions ----------------------------------------------

_DISTINCT_ORACLE = """
SELECT DISTINCT l_returnflag, l_linestatus,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS ship_year
FROM lineitem
"""


@query("distinct_rows", oracle=_DISTINCT_ORACLE, tags=("setop", "distinct"))
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_returnflag",
        "l_linestatus",
        F.year("l_shipdate").cast("long").alias("ship_year"),
    ).distinct()


# --- dedup-by-key with an explicit total order ------------------------------
# dropDuplicates([key]) keeps an ARBITRARY row — non-deterministic under
# shuffle. The engine's dedup-by-key always goes through a window with a
# unique tiebreak (same operator the CDC upsert uses, cdc/upsert.py).

_DEDUP_ORACLE = """
SELECT o_custkey, o_orderkey AS latest_orderkey, o_totalprice AS latest_price
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
"""


@query("dedup_by_key_latest", oracle=_DEDUP_ORACLE, tags=("dedup",))
def dedup_by_key_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_totalprice").alias("latest_price"),
        )
    )


# --- intersect all / except all (multiset semantics) ------------------------
# The ALL variants preserve multiplicity: a value occurring x times in a and
# y times in b appears max(x-y,0) times (EXCEPT ALL) / min(x,y) times
# (INTERSECT ALL). Spark plans both as aggregate-count + generate — one
# shuffle, no join.

_EXCEPT_ALL_ORACLE = """
SELECT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
EXCEPT ALL
SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
"""


@query("setop_except_all", oracle=_EXCEPT_ALL_ORACLE, tags=("setop",))
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    a = orders.filter(F.year("o_orderdate") == 1995).select(
        F.col("o_custkey").alias("custkey")
    )
    b = orders.filter(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.exceptAll(b)


_INTERSECT_ALL_ORACLE = """
SELECT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
INTERSECT ALL
SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
"""


@query("setop_intersect_all", oracle=_INTERSECT_ALL_ORACLE, tags=("setop",))
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    a = orders.filter(F.year("o_orderdate") == 1995).select(
        F.col("o_custkey").alias("custkey")
    )
    b = orders.filter(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersectAll(b)
