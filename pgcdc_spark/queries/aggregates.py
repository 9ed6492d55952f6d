"""Aggregation queries (SURVEY.md §2.2): hash agg, distinct, rollup/cube,
filtered agg, collect, percentiles, stable stddev, approx-distinct.

All sums go through exact decimal arithmetic and are emitted as doubles so
results are independent of partitioning / aggregation order (the parity
discipline in queries/__init__.py). Partial aggregation (map-side combine)
is automatic under Tungsten for every groupBy here.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from . import query


def _dsum(col, prec: str = "18,4"):
    return F.sum(col.cast(f"decimal({prec})")).cast("double")


# --- distinct counts + min/max/count per group -----------------------------

_DISTINCT_ORACLE = """
SELECT
  c_mktsegment,
  COUNT(*) AS n_cust,
  COUNT(DISTINCT c_nationkey) AS n_nations,
  CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
  CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@query("agg_distinct_stats", oracle=_DISTINCT_ORACLE, tags=("agg",))
def agg_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (cust,) = load(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.min("c_acctbal").cast("double").alias("min_bal"),
            F.max("c_acctbal").cast("double").alias("max_bal"),
            _dsum(F.col("c_acctbal")).alias("sum_bal"),
        )
        .orderBy("c_mktsegment")
    )


# --- rollup -----------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT
  COALESCE(r_name, 'ALL') AS region_name,
  COALESCE(n_name, 'ALL') AS nation_name,
  COUNT(*) AS n_cust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


@query("agg_rollup", oracle=_ROLLUP_ORACLE, tags=("agg", "rollup"))
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, nation, region = load(spark, sf_dir, "customer", "nation", "region")
    joined = cust.join(
        # bounded: 25-nation / 5-region dims
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_cust"), _dsum(F.col("c_acctbal")).alias("sum_bal"))
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region_name"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation_name"),
            "n_cust",
            "sum_bal",
        )
    )


# --- cube -------------------------------------------------------------------

_CUBE_ORACLE = """
SELECT
  COALESCE(l_returnflag, 'ALL') AS returnflag,
  COALESCE(l_linestatus, 'ALL') AS linestatus,
  COUNT(*) AS n_lines,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@query("agg_cube", oracle=_CUBE_ORACLE, tags=("agg", "cube"))
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_lines"), _dsum(F.col("l_quantity")).alias("sum_qty"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "n_lines",
            "sum_qty",
        )
    )


# --- filtered / conditional aggregation (manual pivot) ----------------------

_FILTERED_ORACLE = """
SELECT
  o_orderpriority,
  COUNT(*) AS n_orders,
  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS open_value,
  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("agg_filtered_pivot", oracle=_FILTERED_ORACLE, tags=("agg", "pivot"))
def agg_filtered_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    dec0 = F.lit(0).cast("decimal(18,4)")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
            F.sum(
                F.when(
                    F.col("o_orderstatus") == "O", F.col("o_totalprice").cast("decimal(18,4)")
                ).otherwise(dec0)
            )
            .cast("double")
            .alias("open_value"),
            F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0))
            .cast("long")
            .alias("n_pending"),
        )
        .orderBy("o_orderpriority")
    )


# --- collect_list / collect_set (canonicalized as sorted joined string) -----

_COLLECT_ORACLE = """
SELECT
  n_regionkey AS regionkey,
  ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT n_name)), ',') AS nations
FROM nation
GROUP BY n_regionkey
"""


@query("agg_collect_set", oracle=_COLLECT_ORACLE, tags=("agg", "collect"))
def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    (nation,) = load(spark, sf_dir, "nation")
    return nation.groupBy(F.col("n_regionkey").alias("regionkey")).agg(
        F.array_join(F.array_sort(F.collect_set("n_name")), ",").alias("nations")
    )


# --- exact percentiles ------------------------------------------------------

_PCT_ORACLE = """
SELECT
  l_returnflag,
  QUANTILE_CONT(l_quantity, 0.25) AS q25,
  QUANTILE_CONT(l_quantity, 0.5) AS median_qty,
  QUANTILE_CONT(l_quantity, 0.75) AS q75,
  QUANTILE_CONT(l_extendedprice, 0.9) AS p90_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("agg_percentiles", oracle=_PCT_ORACLE, tags=("agg", "percentile"))
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", F.lit(0.25)).alias("q25"),
            F.percentile("l_quantity", F.lit(0.5)).alias("median_qty"),
            F.percentile("l_quantity", F.lit(0.75)).alias("q75"),
            F.percentile("l_extendedprice", F.lit(0.9)).alias("p90_price"),
        )
        .orderBy("l_returnflag")
    )


# --- stable stddev/variance via exact decimal sums --------------------------
# Spark's stddev/var aggregate is merge-order dependent on doubles, so a
# direct comparison to DuckDB is flaky; both sides compute the textbook
# (n*sum(x^2) - sum(x)^2) / (n*(n-1)) from EXACT decimal sums instead.

# Every intermediate is EXACT decimal until the single final
# double cast: factors cast to DECIMAL(12,2) BEFORE multiplying (a
# double PRODUCT cast to decimal rounds via shortest-repr in Spark vs
# exact-binary in DuckDB and diverges once products exceed ~1e8 — found
# at sf0.1), products/(sums) stay exact, and the n*Sxx - Sx^2 moment
# subtraction happens in decimal. Widths sized for sf <= ~100 (documented
# overflow point, not a silent one — decimal overflow errors loudly).
_STDDEV_ORACLE = """
SELECT
  c_mktsegment,
  COUNT(*) AS n,
  SQRT(GREATEST(CAST(
    (CAST(COUNT(*) AS DECIMAL(8,0))
       * CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)) * CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(20,4))
     - CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(19,2))
       * CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(19,2)))
    AS DOUBLE)
    / (CAST(COUNT(*) AS DOUBLE) * (CAST(COUNT(*) AS DOUBLE) - 1.0)), 0.0)) AS stddev_bal
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@query("agg_stddev_stable", oracle=_STDDEV_ORACLE, tags=("agg", "stats"))
def agg_stddev_stable(spark: SparkSession, sf_dir: str) -> DataFrame:
    (cust,) = load(spark, sf_dir, "customer")
    n = F.count(F.lit(1)).cast("double")
    xd = F.col("c_acctbal").cast("decimal(12,2)")
    nd = F.count(F.lit(1)).cast("decimal(8,0)")
    sum_x = F.sum(xd).cast("decimal(19,2)")
    sum_x2 = F.sum(xd * xd).cast("decimal(20,4)")
    var = (nd * sum_x2 - sum_x * sum_x).cast("double") / (n * (n - F.lit(1.0)))
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sqrt(F.greatest(var, F.lit(0.0))).alias("stddev_bal"),
        )
        .orderBy("c_mktsegment")
    )


# --- global aggregation (no grouping) ---------------------------------------

_GLOBAL_ORACLE = """
SELECT
  COUNT(*) AS n_lines,
  COUNT(DISTINCT l_orderkey) AS n_orders,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
  CAST(MIN(l_shipdate) AS DATE) AS first_ship,
  CAST(MAX(l_shipdate) AS DATE) AS last_ship
FROM lineitem
"""


@query("agg_global", oracle=_GLOBAL_ORACLE, tags=("agg",))
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        _dsum(F.col("l_extendedprice")).alias("total_price"),
        F.min("l_shipdate").cast("date").alias("first_ship"),
        F.max("l_shipdate").cast("date").alias("last_ship"),
    )


# --- approx count distinct (HLL++) — engines' sketches differ, so the
# driver records a rows-only check (no oracle). The exact twin above
# (agg_distinct_stats / agg_global) is the correctness anchor.


@query("agg_approx_distinct", oracle=None, tags=("agg", "approx"))
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
    )


# --- grouping sets (generalizes rollup/cube: explicit grouping lattice) -----
# Declared in SQL: Expand + one hash aggregate — each input row is emitted
# once per grouping set, then partially aggregated map-side, so the shuffle
# carries |sets| x |distinct keys| rows, not |sets| x |input|.

_GROUPING_SETS_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
  COUNT(*) AS n_lines,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@query("agg_grouping_sets", oracle=_GROUPING_SETS_SQL, tags=("agg", "groupingsets"))
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import load_table

    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_GROUPING_SETS_SQL)


# --- correlation / covariance from exact decimal moments --------------------

# Same exact-decimal-end-to-end scheme as _STDDEV_ORACLE: factors cast
# to DECIMAL(12,2) before any multiplication, sums down-cast to tight
# exact widths so n*Sxy and Sx*Sy stay under precision 38.
_CORR_NUM = """(CAST(COUNT(*) AS DECIMAL(8,0))
       * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(20,4))
     - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(19,2))
       * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(19,2)))"""

_CORR_VAR = """(CAST(COUNT(*) AS DECIMAL(8,0))
       * CAST(SUM(CAST({c} AS DECIMAL(12,2)) * CAST({c} AS DECIMAL(12,2))) AS DECIMAL(20,4))
     - CAST(SUM(CAST({c} AS DECIMAL(12,2))) AS DECIMAL(19,2))
       * CAST(SUM(CAST({c} AS DECIMAL(12,2))) AS DECIMAL(19,2)))"""

_CORR_ORACLE = f"""
SELECT
  l_returnflag,
  COUNT(*) AS n,
  ROUND(CAST({_CORR_NUM} AS DOUBLE)
  / (CAST(COUNT(*) AS DOUBLE) * (CAST(COUNT(*) AS DOUBLE) - 1.0)), 9) AS covar_qty_price,
  ROUND(
    CAST({_CORR_NUM} AS DOUBLE)
    / (SQRT(CAST({_CORR_VAR.format(c="l_quantity")} AS DOUBLE))
       * SQRT(CAST({_CORR_VAR.format(c="l_extendedprice")} AS DOUBLE))),
    9) AS corr_qty_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("agg_corr_covar", oracle=_CORR_ORACLE, tags=("agg", "stats"))
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample covariance with the cancellation-prone
    moment subtractions (n*Sxy - Sx*Sy etc.) done in EXACT decimal
    arithmetic, cast to double only afterwards. In doubles that
    subtraction cancels ~6 orders of magnitude, so engine-level FMA
    contraction differences blow up to ~500 ulps — exact decimals make the
    numerator a single correctly-rounded value on both engines. Factors
    cast to decimal BEFORE multiplying: a double PRODUCT cast to decimal
    rounds via shortest-repr in Spark vs exact binary in DuckDB and
    diverges once products exceed ~1e8 (found at sf0.1). Widths hold to
    ~sf100, then decimal overflow errors loudly. Built-in corr/covar_samp
    stream doubles in partition order and cannot hash-match across
    engines at all. Covar (like corr) is emitted ROUND(...,9): the exact
    decimal numerator exceeds int64, and DuckDB's int128-decimal->double
    conversion double-rounds (unscaled->double, then /10^scale) vs
    Java's single correctly-rounded conversion — a 1-ulp divergence at
    sf0.1 that the 9-decimal emission absorbs."""
    (li,) = load(spark, sf_dir, "lineitem")
    xd = F.col("l_quantity").cast("decimal(12,2)")
    yd = F.col("l_extendedprice").cast("decimal(12,2)")
    n = F.count(F.lit(1)).cast("double")
    nd = F.count(F.lit(1)).cast("decimal(8,0)")
    sx = F.sum(xd).cast("decimal(19,2)")
    sy = F.sum(yd).cast("decimal(19,2)")
    sxy = F.sum(xd * yd).cast("decimal(20,4)")
    sxx = F.sum(xd * xd).cast("decimal(20,4)")
    syy = F.sum(yd * yd).cast("decimal(20,4)")
    num_xy = (nd * sxy - sx * sy).cast("double")
    var_x = (nd * sxx - sx * sx).cast("double")
    var_y = (nd * syy - sy * sy).cast("double")
    cov = num_xy / (n * (n - F.lit(1.0)))
    corr = F.round(num_xy / (F.sqrt(var_x) * F.sqrt(var_y)), 9)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(cov, 9).alias("covar_qty_price"),
            corr.alias("corr_qty_price"),
        )
        .orderBy("l_returnflag")
    )


# --- regression aggregates (exact-sum closed form) -----------------------------
# Per-group ordinary least squares from the five classic sufficient
# statistics (n, Sx, Sy, Sxx, Sxy [, Syy for r2]) — the textbook
# map-side-combinable shape: every statistic is a plain SUM, so the
# whole regression is ONE partial-aggregated shuffle no matter how many
# groups or rows (the same reason SQL engines expose regr_slope as an
# aggregate). Spark HAS regr_slope/regr_intercept/regr_r2 built-ins, but
# their float accumulation order is partition-dependent — not
# hash-checkable. Instead the sufficient statistics go through EXACT
# decimal sums (the engine-wide oracle convention) and the closed form
# is evaluated in identical IEEE double arithmetic on both engines:
#   slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
#   intercept = (Sy - slope*Sx) / n
#   r2 = (n*Sxy - Sx*Sy)^2 / ((n*Sxx - Sx^2) * (n*Syy - Sy^2))

_LINREG_ORACLE = """
WITH s AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(event_id AS DECIMAL(18,0))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(event_id AS DECIMAL(18,0))
                  * CAST(event_id AS DECIMAL(18,0))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(event_id AS DECIMAL(18,0))
                  * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(value AS DECIMAL(18,4))
                  * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS syy
  FROM events GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       ROUND((n*sxy - sx*sy) / (n*sxx - sx*sx), 9) AS slope,
       ROUND((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 9)
         AS intercept,
       ROUND(((n*sxy - sx*sy) * (n*sxy - sx*sy))
             / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 9) AS r2
FROM s
ORDER BY event_type
"""


@query("agg_linreg_by_type", oracle=_LINREG_ORACLE,
       tags=("agg", "regression", "stats"))
def agg_linreg_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    xd = F.col("event_id").cast("decimal(18,0)")
    yd = F.col("value").cast("decimal(18,4)")
    s = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(xd * yd).cast("double").alias("sxy"),
        F.sum(yd * yd).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "event_type",
        n.cast("long").alias("n"),
        F.round(slope, 9).alias("slope"),
        F.round((sy - slope * sx) / n, 9).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            9,
        ).alias("r2"),
    ).orderBy("event_type")


# --- smoothed target encoding (ML feature engineering) -------------------------
# The classic high-cardinality categorical encoder: replace a category
# with its smoothed target mean, enc = (sum_cat + global_mean * m) /
# (n_cat + m) — shrinks rare categories toward the prior (m = 10).
# Scale shape: one partial-agg shuffle for the per-category sums plus a
# broadcast of the single-row global prior; at 100 TB the encoder table
# is |categories| rows and ships back to the feature join as a
# broadcast. Sums go through exact decimals so the double chain is
# engine-identical.

_TENC_ORACLE = """
WITH g AS (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS gs,
         COUNT(*) AS gn
  FROM orders
),
c AS (
  SELECT o_orderpriority AS category,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS cs,
         COUNT(*) AS cn
  FROM orders GROUP BY o_orderpriority
)
SELECT category,
       CAST(cn AS BIGINT) AS n,
       ROUND((cs + (gs / gn) * 10.0) / (cn + 10.0), 9) AS encoded
FROM c, g
ORDER BY category
"""


@query("feat_target_encoding", oracle=_TENC_ORACLE,
       tags=("agg", "features", "ml"))
def feat_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    td = F.col("o_totalprice").cast("decimal(18,4)")
    g = orders.agg(
        F.sum(td).cast("double").alias("gs"),
        F.count(F.lit(1)).alias("gn"),
    )
    c = orders.groupBy(F.col("o_orderpriority").alias("category")).agg(
        F.sum(td).cast("double").alias("cs"),
        F.count(F.lit(1)).alias("cn"),
    )
    return (
        # bounded: 1-row global aggregate
        c.crossJoin(F.broadcast(g))
        .select(
            "category",
            F.col("cn").cast("long").alias("n"),
            F.round(
                (F.col("cs") + (F.col("gs") / F.col("gn")) * 10.0)
                / (F.col("cn") + 10.0),
                9,
            ).alias("encoded"),
        )
        .orderBy("category")
    )


# --- ABC / Pareto classification ------------------------------------------------
# The BI staple: rank customers by revenue, classify by cumulative
# revenue share (A: first 70%, B: to 90%, C: rest). One partial-agg
# shuffle for per-customer revenue, one window over the global revenue
# order for the running share (single sort at |customers| rows, far
# smaller than the fact table), broadcast 1-row total. Exact decimal
# revenue keeps the cumulative chain engine-identical: the running sum
# is computed IN DECIMAL and only the final share divides as double.

_ABC_ORACLE = """
WITH rev AS (
  SELECT o_custkey,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS r
  FROM orders GROUP BY o_custkey
),
run AS (
  SELECT o_custkey, r,
         SUM(r) OVER (ORDER BY r DESC, o_custkey
                      ROWS UNBOUNDED PRECEDING) AS cum,
         (SELECT SUM(r) FROM rev) AS tot
  FROM rev
)
SELECT o_custkey,
       CAST(r AS DOUBLE) AS revenue,
       ROUND(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 9) AS cum_share,
       CASE WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.7 THEN 'A'
            WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.9 THEN 'B'
            ELSE 'C' END AS abc_class
FROM run
ORDER BY revenue DESC, o_custkey
"""


@query("agg_abc_pareto", oracle=_ABC_ORACLE, tags=("agg", "window", "bi"))
def agg_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    (orders,) = load(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("r")
    )
    w = Window.orderBy(F.desc("r"), "o_custkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = rev.agg(F.sum("r").alias("tot"))
    # bounded: 1-row total
    run = rev.withColumn("cum", F.sum("r").over(w)).crossJoin(F.broadcast(tot))
    share = F.col("cum").cast("double") / F.col("tot").cast("double")
    return run.select(
        "o_custkey",
        F.col("r").cast("double").alias("revenue"),
        F.round(share, 9).alias("cum_share"),
        F.when(share <= 0.7, "A").when(share <= 0.9, "B").otherwise("C")
        .alias("abc_class"),
    ).orderBy(F.desc("revenue"), "o_custkey")


# --- RFM segmentation -----------------------------------------------------------
# Recency / Frequency / Monetary quintile scoring — the classic customer
# segmentation. One partial-agg shuffle to per-customer (last order
# date, order count, exact-decimal revenue), then three ntile(5)
# windows over the |customers|-row aggregate (not the fact table). Every
# ntile order includes o_custkey as the final tiebreaker, so bucket
# boundaries are deterministic and engine-identical — ntile is pure rank
# arithmetic once the order is total.

_RFM_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, last_order, n_orders, revenue,
       NTILE(5) OVER (ORDER BY last_order DESC, o_custkey) AS r_score,
       NTILE(5) OVER (ORDER BY n_orders DESC, o_custkey) AS f_score,
       NTILE(5) OVER (ORDER BY revenue DESC, o_custkey) AS m_score
FROM per_cust
ORDER BY o_custkey
"""


@query("agg_rfm_segmentation", oracle=_RFM_ORACLE,
       tags=("agg", "window", "segmentation"))
def agg_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    (orders,) = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double").alias("revenue"),
    )
    return per_cust.select(
        "o_custkey", "last_order", "n_orders", "revenue",
        F.ntile(5).over(
            Window.orderBy(F.desc("last_order"), "o_custkey")
        ).alias("r_score"),
        F.ntile(5).over(
            Window.orderBy(F.desc("n_orders"), "o_custkey")
        ).alias("f_score"),
        F.ntile(5).over(
            Window.orderBy(F.desc("revenue"), "o_custkey")
        ).alias("m_score"),
    ).orderBy("o_custkey")
