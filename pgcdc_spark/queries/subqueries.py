"""Subquery operators: EXISTS / IN / correlated & uncorrelated scalar.

The reference delegates all SQL to PostgreSQL (src/database/postgresql/
PostgresPg.ts:5-14 — a passthrough executor, R3 in SURVEY.md §2.1); our
engine runs the same class of queries through Catalyst, whose rewrites do
the heavy lifting (SURVEY.md §4.2):

- EXISTS / IN   -> RewritePredicateSubquery => left-semi join (shuffle or
  broadcast by size); NOT EXISTS => left-anti.
- correlated scalar subquery -> decorrelated into an aggregate + join on
  the correlation key (RewriteCorrelatedScalarSubquery).
- uncorrelated scalar subquery -> one-row subquery plan, broadcast as a
  literal into the filter (no per-row recomputation).

These are declared in SQL deliberately: the point is that the *optimizer*
picks the join strategy — at 100 TB the semi-join build side and the
decorrelated aggregate both shuffle on the correlation key, which is the
plan a hand-written join would produce anyway, with no driver round-trips.

Parity discipline: sums/averages that feed value output or filter
boundaries go through exact DECIMAL accumulation (see queries/__init__
docstring); AVG(l_quantity) is a double sum of small integers — exact in
IEEE double regardless of partition order, so safe to compare unhedged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from . import query


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


# --- EXISTS (TPC-H Q4 flavor: orders with a late-shipped lineitem) ----------

_EXISTS_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
"""


@query("subq_exists_late_orders", oracle=_EXISTS_SQL, tags=("subquery", "semi"))
def subq_exists_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Catalyst rewrites EXISTS to a left-semi join on l_orderkey =
    # o_orderkey with the correlated date predicate as the join condition —
    # lineitem never materializes more than (orderkey, shipdate).
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_EXISTS_SQL)


# --- IN + aggregate HAVING (TPC-H Q18 flavor: large-quantity orders) --------

_IN_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 200
)
"""


@query("subq_in_big_qty_orders", oracle=_IN_SQL, tags=("subquery", "semi"))
def subq_in_big_qty_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IN (aggregated subquery) => aggregate lineitem on l_orderkey
    # (partial+final), then left-semi join orders — one shuffle each side,
    # co-partitioned on the join key. HAVING compares exact decimals so the
    # qualifying set is identical across engines.
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_IN_SQL)


# --- correlated scalar subquery (TPC-H Q17 flavor) --------------------------

_CORR_SQL = """
SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_quantity
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#4'
  AND l.l_quantity < (
    SELECT 0.5 * AVG(l2.l_quantity)
    FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
"""


@query("subq_scalar_correlated", oracle=_CORR_SQL, tags=("subquery", "scalar"))
def subq_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Decorrelation: Catalyst turns the per-row subquery into
    # (lineitem groupBy l_partkey agg avg) joined on l_partkey — evaluated
    # once per key, not once per row. part is small => broadcast side.
    # AVG of integer quantities is order-insensitive in double, so the
    # filter boundary is deterministic on both engines.
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_CORR_SQL)


# --- uncorrelated scalar subquery -------------------------------------------
# The scalar is computed with exact decimal SUM / COUNT (not AVG of raw
# doubles) so the comparison boundary is bit-identical across engines.

_GLOBAL_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice > 1.8 * (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
  FROM orders
)
"""


@query("subq_scalar_global", oracle=_GLOBAL_SQL, tags=("subquery", "scalar"))
def subq_scalar_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The subquery collapses to a single-row plan executed once; its value
    # is fed into the main filter as a literal — at 100 TB this is one
    # tiny aggregate job, then a pushdown-friendly scan filter.
    _views(spark, sf_dir, "orders")
    return spark.sql(_GLOBAL_SQL)


# --- correlated LATERAL subquery (per-row top-n) -----------------------------
# The SQL-standard way to ask "for each dim row, the top-n related rows"
# without a window over the whole fact table. Spark decorrelates the
# LATERAL into a join + per-group limit; DuckDB executes it natively —
# both see the same deterministic (count DESC, name ASC) total order.

_LATERAL_SQL = """
SELECT r.r_name, t.n_name, t.n_customers
FROM region r,
LATERAL (
  SELECT n.n_name, COUNT(*) AS n_customers
  FROM nation n
  JOIN customer c ON c.c_nationkey = n.n_nationkey
  WHERE n.n_regionkey = r.r_regionkey
  GROUP BY n.n_name
  ORDER BY n_customers DESC, n.n_name
  LIMIT 2
) t
"""


@query("subq_lateral_topn", oracle=_LATERAL_SQL, tags=("subquery", "lateral"))
def subq_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 nations by customer count per region via LATERAL.

    Scale shape: the customer->nation aggregate reduces with map-side
    partial combine before its shuffle; the lateral's per-region
    ORDER BY/LIMIT applies to the tiny aggregated set. The region side
    broadcasts. Nothing here iterates per driver row — LATERAL is a plan
    construct, not a loop."""
    _views(spark, sf_dir, "region", "nation", "customer")
    return spark.sql(_LATERAL_SQL)
