"""Join queries (SURVEY.md §2.2): equi (broadcast + shuffle), semi/anti,
outer, range/theta, multi-hop star, as-of.

Scale notes baked into each plan:
- dims (region, nation, supplier, part at low SF) are broadcast — no
  shuffle of the fact side;
- fact-fact joins (lineitem x orders) shuffle on the join key once; AQE
  picks SMJ/SHJ and splits skewed partitions;
- the as-of join uses the union+window pattern (see operators/asof.py)
  instead of an O(n*m) range join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from ..operators.asof import asof_join
from . import query


def _dsum(col, prec: str = "22,6"):
    return F.sum(col.cast(f"decimal({prec})")).cast("double")


# --- Q3-style: 3-way join + agg + deterministic top-k ----------------------

_Q3_ORACLE = """
SELECT
  l_orderkey,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue,
  CAST(o_orderdate AS DATE) AS order_date,
  o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q3_shipping_priority", oracle=_Q3_ORACLE, tags=("join", "agg", "topk"))
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li = load(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    return (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders.filter(F.col("o_orderdate") < cutoff), F.col("c_custkey") == F.col("o_custkey"))
        .join(li.filter(F.col("l_shipdate") > cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --- Q5-style: 6-way star join through dims, broadcast the small side ------

_Q5_ORACLE = """
SELECT
  n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@query("q5_local_supplier_volume", oracle=_Q5_ORACLE, tags=("join", "agg", "broadcast"))
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li, supp, nation, region = load(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    return (
        cust.join(
            orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            # supplier is corpus-scaled: no broadcast FORCE — the scan's
            # file-size estimate picks broadcast while it fits and
            # switches to a shuffled join when the corpus outgrows it
            # (r12 audit: a forced broadcast never flips, so it would
            # ship an arbitrarily large relation at 100 TB)
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        # bounded: 25 nations / filtered regions — fixed-size dims
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


# --- semi / anti ------------------------------------------------------------

_SEMI_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000
)
"""


@query("join_semi", oracle=_SEMI_ORACLE, tags=("join", "semi"))
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = load(spark, sf_dir, "customer", "orders")
    big = orders.filter(F.col("o_totalprice") > 300000)
    return cust.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_name"
    )


_ANTI_ORACLE = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND EXTRACT(year FROM o_orderdate) = 1996
)
"""


@query("join_anti", oracle=_ANTI_ORACLE, tags=("join", "anti"))
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Restricted to 1996 orders so the result is non-empty on the test data
    # (every custkey appears in orders overall, so the unrestricted anti-join
    # would be a vacuous 0-row check).
    cust, orders = load(spark, sf_dir, "customer", "orders")
    o96 = orders.filter(F.year("o_orderdate") == 1996)
    return cust.join(o96, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


# --- outer joins (null-producing, coalesce handling) -----------------------

_LEFT_ORACLE = """
SELECT
  c_custkey,
  COALESCE(cnt, 0) AS order_count,
  COALESCE(total, 0.0) AS total_spend
FROM customer
LEFT JOIN (
  SELECT o_custkey,
         COUNT(*) AS cnt,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
  FROM orders GROUP BY o_custkey
) o ON o_custkey = c_custkey
"""


@query("join_left_outer_agg", oracle=_LEFT_ORACLE, tags=("join", "outer"))
def join_left_outer_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = load(spark, sf_dir, "customer", "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("total"),
    )
    return cust.join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left").select(
        "c_custkey",
        F.coalesce(F.col("cnt"), F.lit(0)).alias("order_count"),
        F.coalesce(F.col("total"), F.lit(0.0)).alias("total_spend"),
    )


_FULL_ORACLE = """
SELECT
  COALESCE(c.nk, s.nk) AS nationkey,
  COALESCE(c.n_cust, 0) AS n_cust,
  COALESCE(s.n_supp, 0) AS n_supp
FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) c
FULL JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
  ON c.nk = s.nk
"""


@query("join_full_outer", oracle=_FULL_ORACLE, tags=("join", "outer"))
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, supp = load(spark, sf_dir, "customer", "supplier")
    c = cust.groupBy(F.col("c_nationkey").alias("c_nk")).agg(F.count(F.lit(1)).alias("n_cust"))
    s = supp.groupBy(F.col("s_nationkey").alias("s_nk")).agg(F.count(F.lit(1)).alias("n_supp"))
    return c.join(s, F.col("c_nk") == F.col("s_nk"), "full").select(
        F.coalesce(F.col("c_nk"), F.col("s_nk")).alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
    )


# --- range / theta join -----------------------------------------------------

_RANGE_ORACLE = """
SELECT
  l_orderkey, l_linenumber, p_partkey, p_size,
  l_quantity
FROM lineitem
JOIN part ON l_partkey = p_partkey
         AND l_quantity BETWEEN p_size - 2 AND p_size + 2
WHERE p_size >= 40
"""


@query("join_equi_plus_range", oracle=_RANGE_ORACLE, tags=("join", "range"))
def join_equi_plus_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = load(spark, sf_dir, "lineitem", "part")
    p = part.filter(F.col("p_size") >= 40)
    # part is corpus-scaled: estimate-driven join strategy, no force
    return li.join(
        p,
        (F.col("l_partkey") == F.col("p_partkey"))
        & F.col("l_quantity").between(F.col("p_size") - 2, F.col("p_size") + 2),
    ).select("l_orderkey", "l_linenumber", "p_partkey", "p_size", "l_quantity")


_THETA_ORACLE = """
SELECT n_nationkey, r_regionkey, n_name, r_name
FROM nation CROSS JOIN region
WHERE n_regionkey <> r_regionkey AND n_nationkey < 5
"""


@query("join_theta_cross", oracle=_THETA_ORACLE, tags=("join", "theta"))
def join_theta_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation, region = load(spark, sf_dir, "nation", "region")
    return (
        nation.filter(F.col("n_nationkey") < 5)
        # bounded: 5-region dim
        .crossJoin(F.broadcast(region))
        .filter(F.col("n_regionkey") != F.col("r_regionkey"))
        .select("n_nationkey", "r_regionkey", "n_name", "r_name")
    )


# --- as-of join (engine helper) --------------------------------------------

_ASOF_ORACLE = """
SELECT
  p.event_id,
  p.user_id,
  (
    SELECT c.event_id FROM events c
    WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
    ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
  ) AS click_event_id
FROM events p
WHERE p.event_type = 'purchase'
"""


@query("join_asof_events", oracle=_ASOF_ORACLE, tags=("join", "asof", "custom"))
def join_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most recent prior click per purchase. Cites reference semantics: the
    reference has no joins at all (SURVEY.md §2.1); this is the engine's
    as-of extension for event-stream enrichment."""
    (events,) = load(spark, sf_dir, "events")
    # us precision on both sides: DuckDB truncates the ns timestamps to us.
    ev = events.withColumn("ts_us", F.expr("ts div 1000"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts_us"), F.col("event_id")
    )
    joined = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts_us",
        right_ts="ts_us",
        right_payload=["event_id"],
        tiebreak="event_id",
    )
    return joined.select("event_id", "user_id", F.col("event_id_asof").alias("click_event_id"))


# 24 hours in µs — the median nearest-click gap at sf0.01 is ~18 h, so this
# matches ~60% of purchases and leaves ~40% legitimately NULL (both the
# matched and the out-of-tolerance branch are exercised by the oracle).
_ASOF_TOL_US = 24 * 3600 * 1_000_000

_ASOF_TOL_ORACLE = f"""
SELECT p.event_id, p.user_id, c.click_event_id, c.click_delta_us
FROM (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'purchase'
) p
LEFT JOIN LATERAL (
  SELECT
    c.event_id AS click_event_id,
    abs(epoch_us(c.ts) - p.ts_us) AS click_delta_us
  FROM events c
  WHERE c.user_id = p.user_id AND c.event_type = 'click'
    AND abs(epoch_us(c.ts) - p.ts_us) <= {_ASOF_TOL_US}
  ORDER BY
    abs(epoch_us(c.ts) - p.ts_us) ASC,
    (CASE WHEN epoch_us(c.ts) <= p.ts_us THEN 0 ELSE 1 END) ASC,
    (CASE WHEN epoch_us(c.ts) <= p.ts_us THEN -c.event_id ELSE c.event_id END) ASC
  LIMIT 1
) c ON TRUE
"""


@query("join_asof_tolerance", oracle=_ASOF_TOL_ORACLE, tags=("join", "asof", "custom"))
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest click per purchase within a 24-hour tolerance — the
    ``pandas.merge_asof(direction='nearest', tolerance=...)`` surface.
    Backward wins exact-distance ties; at equal click ts the backward side
    picks the largest event_id and the forward side the smallest (the
    operator's documented tiebreak), which the LATERAL oracle mirrors."""
    (events,) = load(spark, sf_dir, "events")
    ev = events.withColumn("ts_us", F.expr("ts div 1000"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts_us", "event_id"
    )
    joined = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts_us",
        right_ts="ts_us",
        right_payload=["event_id", "ts_us"],
        tiebreak="event_id",
        direction="nearest",
        tolerance=_ASOF_TOL_US,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("event_id_asof").alias("click_event_id"),
        F.abs(F.col("ts_us") - F.col("ts_us_asof")).alias("click_delta_us"),
    )


# --- salted skew join (engine helper; result identical to plain join) -------

_SALTED_ORACLE = """
SELECT
  o.o_orderpriority,
  COUNT(*) AS n_lines,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@query("join_salted_skew", oracle=_SALTED_ORACLE, tags=("join", "skew", "custom"))
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted-join helper driven through a real aggregation: lineitem's
    l_orderkey is spread over 16 salts so a pathological hot order would
    land on 16 reducers instead of one. The oracle is the PLAIN join —
    salting must be semantically invisible."""
    from ..operators.salted import salted_join

    li, orders = load(spark, sf_dir, "lineitem", "orders")
    j = salted_join(
        li.select("l_orderkey", "l_extendedprice"),
        orders.select("o_orderkey", "o_orderpriority")
        .withColumnRenamed("o_orderkey", "l_orderkey"),
        on="l_orderkey",
        n_salts=16,
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double").alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


# --- binned range join (engine helper; interval containment at scale) --------

_RANGE_BINNED_ORACLE = """
SELECT e.event_id AS error_id,
       COUNT(*) AS n_clicks,
       MIN(c.event_id) AS first_click_id
FROM events e JOIN events c
  ON epoch_us(c.ts) BETWEEN epoch_us(e.ts) - 300000000
                        AND epoch_us(e.ts) + 300000000
WHERE e.event_type = 'error' AND c.event_type = 'click'
GROUP BY e.event_id
ORDER BY error_id
"""


@query("join_range_binned", oracle=_RANGE_BINNED_ORACLE,
       tags=("join", "range", "custom"))
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks within ±5 minutes of each error event — a pure interval
    join with NO equi key, which naively compiles to a nested loop. The
    binned_range_join operator makes it a hash join on 10-minute bins
    (each error window spans ≤2 bins), so at 100 TB both sides partition
    by bin instead of replicating one side everywhere. Times are epoch-µs
    on both engines (ts is ns in parquet; DuckDB truncates ns to µs)."""
    from ..operators.rangejoin import binned_range_join

    (events,) = load(spark, sf_dir, "events")
    # integer div: epoch-ns exceeds double's exact integer range (2^53)
    us = F.expr("ts div 1000")
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        (us - 300_000_000).alias("w_start"),
        (us + 300_000_000).alias("w_end"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), us.alias("click_us")
    )
    joined = binned_range_join(
        clicks, errors, "click_us", "w_start", "w_end", bin_width=600_000_000
    )
    return (
        joined.groupBy("error_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.min("click_id").alias("first_click_id"),
        )
        .orderBy("error_id")
    )


# --- MERGE INTO (engine operator; full three-branch SQL MERGE) ---------------

_MERGE_ORACLE = """
WITH agg AS (
  SELECT o_custkey AS k,
         SUM(CAST(o_totalprice AS DECIMAL(22,6))) AS rev,
         COUNT(*) AS n
  FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
),
src AS (
  SELECT k, rev, n FROM agg
  UNION ALL
  SELECT -k, rev, n FROM agg WHERE k % 97 = 0 AND k <> 0
)
SELECT
  COALESCE(c.c_custkey, s.k) AS c_custkey,
  CASE WHEN c.c_custkey IS NULL THEN 'backfill' ELSE c.c_name END AS c_name,
  CAST(CASE
    WHEN c.c_custkey IS NOT NULL AND s.k IS NOT NULL
      THEN c.c_acctbal + CAST(s.rev AS DOUBLE)
    WHEN c.c_custkey IS NULL THEN CAST(s.rev AS DOUBLE)
  END AS DOUBLE) AS c_acctbal,
  CASE WHEN c.c_custkey IS NULL THEN 'NEW' ELSE c.c_mktsegment END AS c_mktsegment
FROM customer c FULL OUTER JOIN src s ON c.c_custkey = s.k
WHERE NOT (c.c_custkey IS NOT NULL AND s.k IS NOT NULL AND s.n >= 7)
  AND NOT (s.k IS NULL)
"""


@query("merge_into_customer_orders", oracle=_MERGE_ORACLE, tags=("merge", "upsert"))
def merge_into_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four MERGE branches in one statement: finished-order revenue
    per customer updates the account balance (matched UPDATE), heavy
    buyers are purged (matched DELETE, n >= 7), synthetic negative-key
    rows backfill as new customers (NOT MATCHED INSERT), and customers
    with no finished orders age out (NOT MATCHED BY SOURCE DELETE). One
    full-outer hash join on the key — no per-branch passes. The single
    double addition (exact-decimal revenue cast to double) is
    order-independent, keeping cross-engine hashes stable."""
    from ..operators.merge import S, T, merge_into

    customer, orders = load(spark, sf_dir, "customer", "orders")
    agg = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(22,6)")).alias("rev"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    synth = agg.filter((F.col("c_custkey") % 97 == 0) & (F.col("c_custkey") != 0)).select(
        (-F.col("c_custkey")).alias("c_custkey"), "rev", "n"
    )
    src = agg.unionByName(synth)
    tgt = customer.select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    return merge_into(
        tgt,
        src,
        on=["c_custkey"],
        when_matched_update={
            "c_acctbal": T("c_acctbal") + S("rev").cast("double"),
        },
        when_matched_delete=S("n") >= 7,
        when_not_matched_insert={
            "c_name": F.lit("backfill"),
            "c_acctbal": S("rev").cast("double"),
            "c_mktsegment": F.lit("NEW"),
        },
        when_not_matched_by_source_delete=True,
    )


# --- market-basket association rules ------------------------------------------
# Co-purchase mining over lineitem: support / confidence / lift for part
# pairs that share an order. The candidate space is bounded the same way
# every serious implementation bounds it — pairs are generated per
# BASKET (self-join co-partitioned on l_orderkey, a < b ordering halves
# it), never across the catalog, so the blow-up is sum(basket_size^2)
# not |parts|^2. Per-item counts join back onto the SURVIVING pairs only
# (support >= 2 filter first). Lift arithmetic is integer-counts ->
# identical double chain, round 9.

_BASKET_ORACLE = """
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM op),
item AS (SELECT l_partkey, COUNT(*) AS c FROM op GROUP BY l_partkey),
pair AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS c_ab
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= 2
)
SELECT pa, pb,
       CAST(c_ab AS BIGINT) AS c_ab,
       ROUND(CAST(c_ab AS DOUBLE) / n_orders, 9) AS support,
       ROUND(CAST(c_ab AS DOUBLE) / ia.c, 9) AS confidence,
       ROUND((CAST(c_ab AS DOUBLE) * n_orders) / (ia.c * ib.c), 9) AS lift
FROM pair
JOIN item ia ON ia.l_partkey = pa
JOIN item ib ON ib.l_partkey = pb
CROSS JOIN n
ORDER BY c_ab DESC, pa, pb
LIMIT 100
"""


@query("assoc_rules_copurchase", oracle=_BASKET_ORACLE,
       tags=("join", "basket", "ml"))
def assoc_rules_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = load(spark, sf_dir, "lineitem")
    op = lineitem.select("l_orderkey", "l_partkey").distinct()
    n = op.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    item = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a, b = op.alias("a"), op.alias("b")
    pair = (
        # corpus x corpus self-join on the basket key: both sides are
        # every (order, item) row, so neither may ever be a broadcast —
        # pin the merge join on l_orderkey (r12 broadcast audit)
        a.join(
            b.hint("merge"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= 2)
    )
    ia = item.select(F.col("l_partkey").alias("pa"), F.col("c").alias("ca"))
    ib = item.select(F.col("l_partkey").alias("pb"), F.col("c").alias("cb"))
    out = (
        # the item-count sides are ITEM-CATALOG-SIZED (one row per
        # distinct part — corpus-scaled), so the lift joins are pinned
        # shuffled-hash, never estimate-driven broadcasts (r12 audit);
        # bounded: n is a 1-row aggregate — broadcast is exact there
        pair.join(ia.hint("shuffle_hash"), "pa")
        .join(ib.hint("shuffle_hash"), "pb")
        .crossJoin(F.broadcast(n))
        .select(
            "pa", "pb",
            F.col("c_ab").cast("long").alias("c_ab"),
            F.round(F.col("c_ab").cast("double") / F.col("n_orders"), 9)
            .alias("support"),
            F.round(F.col("c_ab").cast("double") / F.col("ca"), 9)
            .alias("confidence"),
            F.round(
                (F.col("c_ab").cast("double") * F.col("n_orders"))
                / (F.col("ca") * F.col("cb")),
                9,
            ).alias("lift"),
        )
        .orderBy(F.desc("c_ab"), "pa", "pb")
        .limit(100)
    )
    return out
