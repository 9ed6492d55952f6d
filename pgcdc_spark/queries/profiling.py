"""Data profiling + data-quality expectations — the ingestion-side
guardrails a CDC-fed warehouse runs continuously.

The reference ships rows with zero validation (its io-ts decoder exists
but is bypassed by an unchecked cast, /root/reference/src/mapping/
customMapper.ts:22); a production feed needs the opposite posture:
every landed table gets a one-pass profile (null rates, cardinalities,
ranges) and a set of declarative expectations (key uniqueness, FK
coverage, domain membership, range bounds) whose violation counts alert
before consumers read garbage.

Scale shapes:
- the profile is ONE aggregation pass emitting all per-column metrics as
  a single row, then a row-local stack into (column, metric...) rows —
  no per-column jobs, no second scan. Exact distinct counts go through
  Spark's expand-based multi-count-distinct (fine for a bounded column
  list; swap approx_count_distinct at wider schemas);
- expectations that need a join (FK orphans) use the same broadcast/
  shuffle machinery as any query; everything else folds into the same
  single-pass aggregate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from . import query

_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")

_PROFILE_ORACLE = " UNION ALL ".join(
    f"""
SELECT
  '{c}' AS column_name,
  COUNT(*) AS n_rows,
  COUNT(*) - COUNT({c}) AS n_null,
  COUNT(DISTINCT {c}) AS n_distinct,
  CAST(MIN({c}) AS VARCHAR) AS min_value,
  CAST(MAX({c}) AS VARCHAR) AS max_value
FROM orders
"""
    for c in _PROFILE_COLS
)


@query("profile_orders_columns", oracle=_PROFILE_ORACLE, tags=("profiling", "agg"))
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of orders in ONE aggregation pass: the metrics
    for every column compute side by side in a single agg row, then stack
    into (column, metrics) rows with a row-local inline expansion — the
    plan scans orders exactly once however many columns are profiled."""
    (orders,) = load(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = orders.agg(*aggs)
    stacked = one.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col(f"{c}__n").alias("n_rows"),
                        F.col(f"{c}__null").alias("n_null"),
                        F.col(f"{c}__distinct").alias("n_distinct"),
                        F.col(f"{c}__min").alias("min_value"),
                        F.col(f"{c}__max").alias("max_value"),
                    )
                    for c in _PROFILE_COLS
                ]
            )
        )
    )
    return stacked


_DQ_ORACLE = """
SELECT 'pk_unique' AS check_name,
       CAST((SELECT COUNT(*) FROM (
          SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1
       )) AS BIGINT) AS n_violations
UNION ALL
SELECT 'pk_not_null',
       CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL) AS BIGINT)
UNION ALL
SELECT 'fk_customer_exists',
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
UNION ALL
SELECT 'status_in_domain',
       CAST((SELECT COUNT(*) FROM orders
             WHERE o_orderstatus NOT IN ('F', 'O', 'P')) AS BIGINT)
UNION ALL
SELECT 'totalprice_positive',
       CAST((SELECT COUNT(*) FROM orders
             WHERE o_totalprice IS NULL OR o_totalprice <= 0) AS BIGINT)
"""


@query("dq_expectations_orders", oracle=_DQ_ORACLE, tags=("profiling", "dq"))
def dq_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectations over orders, one row per check with its
    violation count. The row-local checks (nulls, domain, range) fold
    into one aggregation pass; uniqueness is one groupBy on the key; the
    FK check is a single anti join (broadcast at dim sizes). A green run
    returns all-zero counts — the driver's value hash pins that, so any
    future data or logic drift trips the gate."""
    orders, customer = load(spark, sf_dir, "orders", "customer")

    row_local = orders.agg(
        F.sum(F.col("o_orderkey").isNull().cast("long")).alias("pk_not_null"),
        F.sum(
            (~F.col("o_orderstatus").isin("F", "O", "P")).cast("long")
        ).alias("status_in_domain"),
        F.sum(
            (F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)).cast("long")
        ).alias("totalprice_positive"),
    )
    dup_keys = (
        orders.groupBy("o_orderkey").count().filter(F.col("count") > 1)
        .agg(F.count(F.lit(1)).alias("pk_unique"))
    )
    orphans = (
        # customer is corpus-scaled: no broadcast force (r12 audit)
        orders.join(customer.select("c_custkey"),
                    F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("fk_customer_exists"))
    )

    combined = row_local.crossJoin(dup_keys).crossJoin(orphans)
    return combined.select(
        F.inline(
            F.array(
                *[
                    F.struct(F.lit(name).alias("check_name"),
                             F.col(name).cast("long").alias("n_violations"))
                    for name in ("pk_unique", "pk_not_null", "fk_customer_exists",
                                 "status_in_domain", "totalprice_positive")
                ]
            )
        )
    )


# --- iterative graph traversal (frontier operator) ---------------------------
# (Historically "the missing recursive CTE"; Spark 4 landed WITH
# RECURSIVE — see graph_bfs_recursive_cte below for the declarative
# twin of this same walk. The operator remains the unbounded-depth
# scale path: per-level dedup + lineage truncation.)
# A deterministic functional graph over the contiguous customer keys
# (node k -> (7k+1) mod N and (13k+3) mod N) gives both engines the same
# edge set from pure arithmetic; the oracle walks it with a recursive CTE
# while the engine uses the iterative BFS operator.

_BFS_MAX_HOPS = 4

_BFS_ORACLE = f"""
WITH RECURSIVE
edges AS (
  SELECT c_custkey AS src, (c_custkey * 7 + 1) % (SELECT COUNT(*) FROM customer) AS dst
  FROM customer
  UNION ALL
  SELECT c_custkey, (c_custkey * 13 + 3) % (SELECT COUNT(*) FROM customer)
  FROM customer
),
bfs(node, hops) AS (
  SELECT c_custkey AS node, 0 AS hops FROM customer WHERE c_custkey % 500 = 0
  UNION
  SELECT e.dst, b.hops + 1
  FROM bfs b JOIN edges e ON e.src = b.node
  WHERE b.hops < {_BFS_MAX_HOPS}
)
SELECT node, CAST(MIN(hops) AS INTEGER) AS hops FROM bfs GROUP BY node
"""


@query("graph_bfs_hops", oracle=_BFS_ORACLE, tags=("graph", "iterative"))
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over a deterministic functional graph on customer
    keys: min hop count within {_BFS_MAX_HOPS} steps from the custkey-
    multiple-of-500 seeds. The engine side is the iterative frontier
    operator (operators/graph.py, per-round O(frontier), lineage
    truncated); the oracle enumerates the same walk with a recursive CTE
    and folds to MIN(hops)."""
    (customer,) = load(spark, sf_dir, "customer")
    n = customer.count()  # bounded scalar (like zorder's stats row)
    k = F.col("c_custkey")
    edges = customer.select(
        k.alias("src"), ((k * 7 + 1) % n).alias("dst")
    ).unionByName(
        customer.select(k.alias("src"), ((k * 13 + 3) % n).alias("dst"))
    )
    sources = customer.filter(k % 500 == 0).select(k.alias("node"))
    from ..operators.graph import shortest_hops

    return shortest_hops(edges, sources, max_hops=_BFS_MAX_HOPS)


# --- PageRank (3 unrolled power iterations) ----------------------------------
# The other classic iterative-graph primitive next to BFS: damped
# PageRank over the SAME deterministic functional graph (2 out-edges per
# customer key), with a FIXED iteration count so the refinement unrolls
# into one declarative plan — no driver loop, no collect, exactly like
# emb_kmeans_lloyd. Exactness: the per-node contribution sums go through
# order-free decimal casts, and every other op is the same IEEE double
# expression on both engines, so ranks hash-match bit-for-bit. Scale
# shape: each iteration is one broadcast-free equi-join edges(dst) x
# ranks(src is carried on the edge) + one partial-agg shuffle on dst —
# the standard distributed PageRank step; the out-degree table is
# derived once.

_PR_DAMP = 0.85
_PR_ITERS = 3  # unrolled

_PAGERANK_ORACLE = f"""
WITH
edges AS (
  SELECT c_custkey AS src, (c_custkey * 7 + 1) % (SELECT COUNT(*) FROM customer) AS dst
  FROM customer
  UNION ALL
  SELECT c_custkey, (c_custkey * 13 + 3) % (SELECT COUNT(*) FROM customer)
  FROM customer
),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
pr0 AS (
  SELECT c_custkey AS node, 1.0 / (SELECT COUNT(*) FROM customer) AS pr
  FROM customer
),
it1 AS (
  SELECT c.c_custkey AS node,
    (1 - {_PR_DAMP}) / (SELECT COUNT(*) FROM customer)
      + {_PR_DAMP} * COALESCE(
          CAST(SUM(CAST(p.pr / g.d AS DECIMAL(28,12))) AS DOUBLE), 0.0) AS pr
  FROM customer c
  LEFT JOIN edges e ON e.dst = c.c_custkey
  LEFT JOIN pr0 p ON p.node = e.src
  LEFT JOIN deg g ON g.src = e.src
  GROUP BY c.c_custkey
),
it2 AS (
  SELECT c.c_custkey AS node,
    (1 - {_PR_DAMP}) / (SELECT COUNT(*) FROM customer)
      + {_PR_DAMP} * COALESCE(
          CAST(SUM(CAST(p.pr / g.d AS DECIMAL(28,12))) AS DOUBLE), 0.0) AS pr
  FROM customer c
  LEFT JOIN edges e ON e.dst = c.c_custkey
  LEFT JOIN it1 p ON p.node = e.src
  LEFT JOIN deg g ON g.src = e.src
  GROUP BY c.c_custkey
),
it3 AS (
  SELECT c.c_custkey AS node,
    (1 - {_PR_DAMP}) / (SELECT COUNT(*) FROM customer)
      + {_PR_DAMP} * COALESCE(
          CAST(SUM(CAST(p.pr / g.d AS DECIMAL(28,12))) AS DOUBLE), 0.0) AS pr
  FROM customer c
  LEFT JOIN edges e ON e.dst = c.c_custkey
  LEFT JOIN it2 p ON p.node = e.src
  LEFT JOIN deg g ON g.src = e.src
  GROUP BY c.c_custkey
)
SELECT node, pr FROM it3
"""


@query("graph_pagerank", oracle=_PAGERANK_ORACLE, tags=("graph", "pagerank"))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank, {iters} unrolled power iterations over the
    deterministic 2-out-regular functional graph on customer keys. Every
    rank value is hash-checked — the oracle replays the identical
    decimal-sum arithmetic. The node count rides as a BROADCAST 1-row
    aggregate (crossJoin) instead of a driver count(), so building this
    query runs no job (r9 — iteration count is fixed/unrolled, so with
    n lazy the whole plan is lazy)."""
    (customer,) = load(spark, sf_dir, "customer")
    # bounded: 1-row count
    ncnt = F.broadcast(
        customer.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    k = F.col("c_custkey")
    base = customer.crossJoin(ncnt)
    edges = base.select(
        k.alias("src"), ((k * 7 + 1) % F.col("__n")).alias("dst")
    ).unionByName(
        base.select(k.alias("src"), ((k * 13 + 3) % F.col("__n")).alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    nodes = base.select(k.alias("node"), F.col("__n"))
    pr = nodes.select("node", (F.lit(1.0) / F.col("__n")).alias("pr"))
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(pr.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select("dst", (F.col("pr") / F.col("d")).alias("w"))
        )
        agg = contrib.groupBy("dst").agg(
            F.sum(F.col("w").cast("decimal(28,12)")).cast("double").alias("s")
        )
        pr = nodes.join(agg, nodes["node"] == agg["dst"], "left").select(
            "node",
            (
                F.lit(1 - _PR_DAMP) / F.col("__n")
                + F.lit(_PR_DAMP) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("pr"),
        )
    return pr


# --- triangle counting --------------------------------------------------------
# The third classic graph primitive (with BFS and PageRank): per-node
# triangle participation over a deterministic ring-with-chords graph on
# customer keys (undirected edges k ~ k+d mod N for d in 1..3, so both
# engines derive the same ~3N-triangle edge set arithmetically). The
# standard scalable algorithm: canonicalize each edge to (u < v) — the
# degree/id ORIENTATION that bounds the two-hop join fan-out — then
# count paths u->v->w closed by the (u, w) edge; every triangle is
# found exactly once with u < v < w. Scale shape: two self equi-joins
# on oriented endpoints (shuffle-partitioned by join key, no cartesian),
# one explode + partial-agg count per node.

_TRI_CHORDS = (1, 2, 3)

_TRIANGLES_ORACLE = f"""
WITH n AS (SELECT COUNT(*) AS n FROM customer),
raw AS (
  {" UNION ALL ".join(
      f"SELECT c_custkey AS a, (c_custkey + {d}) % (SELECT n FROM n) AS b FROM customer"
      for d in _TRI_CHORDS)}
),
e AS (
  SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v FROM raw WHERE a <> b
),
tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM e e1
  JOIN e e2 ON e2.u = e1.v
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
member AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM member GROUP BY node
"""


@query("graph_triangle_count", oracle=_TRIANGLES_ORACLE,
       tags=("graph", "triangles"))
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts via oriented two-hop closure — each
    triangle enumerated exactly once as u < v < w, membership exploded
    and counted with map-side partial aggregation. The node count rides
    as a broadcast 1-row aggregate, so the build runs no job (r9)."""
    (customer,) = load(spark, sf_dir, "customer")
    # bounded: 1-row count
    base = customer.crossJoin(F.broadcast(
        customer.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    ))
    k = F.col("c_custkey")
    raw = None
    for d in _TRI_CHORDS:
        part = base.select(k.alias("a"), ((k + d) % F.col("__n")).alias("b"))
        raw = part if raw is None else raw.unionByName(part)
    e = (
        raw.filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )
    e1 = e.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = e.select(F.col("u").alias("y"), F.col("v").alias("z"))
    e3 = e.select(F.col("u").alias("x"), F.col("v").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    member = (
        tri.select(F.col("x").alias("node"))
        .unionByName(tri.select(F.col("y").alias("node")))
        .unionByName(tri.select(F.col("z").alias("node")))
    )
    return member.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


# --- native recursive CTE (Spark 4 WITH RECURSIVE) ----------------------------
# graph_bfs_hops exists because recursive CTEs were historically the one
# relational construct Spark lacked (the module comment above says so);
# Spark 4 landed WITH RECURSIVE, so the engine now also runs the SAME
# walk DECLARATIVELY — and the DuckDB oracle is literally the same
# recursive SQL, making this the strongest possible parity check (one
# query text, two engines). UNION ALL recursion is used on the Spark
# side (its rCTE step semantics); revisits within the hop bound are
# folded by the final MIN(hops), which is equivalent to the oracle's
# UNION-dedup for this aggregate. Scale shape: each recursion level
# executes as one equi-join of the previous level against the edge
# table — identical cost to the unrolled-join plans (PageRank, k-means);
# the depth bound caps the blow-up. For UNBOUNDED depth or cyclic
# frontiers the iterative operator (operators/graph.py) with per-level
# dedup and lineage truncation remains the scale path — this query is
# the declarative twin, not its replacement.

@query("graph_bfs_recursive_cte", oracle=_BFS_ORACLE,
       tags=("graph", "recursive", "sql"))
def graph_bfs_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS expressed as a native WITH RECURSIVE query — the
    same functional graph, seeds, and hop bound as graph_bfs_hops, with
    the recursion executed by Spark's own recursive-CTE machinery
    instead of the frontier operator. The oracle runs the same walk
    with UNION (per-level dedup) where the engine recurses with UNION
    ALL — equivalent under the final MIN(hops) fold, NOT textually
    interchangeable (pasting UNION ALL into an unbounded-depth oracle
    would blow up; see the block comment above). The driver still
    hash-checks Spark's recursive execution against DuckDB's."""
    (customer,) = load(spark, sf_dir, "customer")
    customer.createOrReplaceTempView("__rcte_customer")
    return spark.sql(f"""
WITH RECURSIVE edges AS (
  SELECT c_custkey AS src,
         (c_custkey * 7 + 1) % (SELECT COUNT(*) FROM __rcte_customer) AS dst
  FROM __rcte_customer
  UNION ALL
  SELECT c_custkey, (c_custkey * 13 + 3) % (SELECT COUNT(*) FROM __rcte_customer)
  FROM __rcte_customer
),
bfs(node, hops) AS (
  SELECT c_custkey AS node, 0 AS hops FROM __rcte_customer WHERE c_custkey % 500 = 0
  UNION ALL
  SELECT e.dst, b.hops + 1
  FROM bfs b JOIN edges e ON e.src = b.node
  WHERE b.hops < {_BFS_MAX_HOPS}
)
SELECT node, CAST(MIN(hops) AS INT) AS hops FROM bfs GROUP BY node
""")


# --- join-key skew profile (the pre-flight for salting decisions) -------------
# operators/salted.py fixes skewed joins; THIS is the diagnostic that
# tells you a key needs it: per candidate join key, the row count, key
# cardinality, heaviest-key count, mean count, their ratio (the salting
# trigger), and the heaviest key itself. Scale shape: one partial-agg
# shuffle per profiled column (|keys| rows after map-side combine),
# then a single-row global fold and a broadcast of the 1-row max for
# the deterministic argmax (min key among ties) — the whole profile is
# two tiny aggregates over each count relation, never a sort. The
# ratio arithmetic is the same IEEE double chain on both engines
# (max/(sum/count)), so it hash-checks exactly.

_SKEW_ORACLE = """
WITH c1 AS (SELECT o_custkey AS k, COUNT(*) AS c FROM orders GROUP BY o_custkey),
m1 AS (SELECT MAX(c) AS m FROM c1),
p1 AS (
  SELECT 'orders.o_custkey' AS key_col,
         CAST(SUM(c) AS BIGINT) AS n_rows,
         COUNT(*) AS n_keys,
         CAST(MAX(c) AS BIGINT) AS max_cnt,
         CAST(SUM(c) AS DOUBLE) / COUNT(*) AS avg_cnt,
         CAST(MAX(c) AS DOUBLE) / (CAST(SUM(c) AS DOUBLE) / COUNT(*)) AS skew_ratio,
         CAST(MIN(CASE WHEN c = (SELECT m FROM m1) THEN k END) AS BIGINT) AS top_key
  FROM c1
),
c2 AS (SELECT l_suppkey AS k, COUNT(*) AS c FROM lineitem GROUP BY l_suppkey),
m2 AS (SELECT MAX(c) AS m FROM c2),
p2 AS (
  SELECT 'lineitem.l_suppkey' AS key_col,
         CAST(SUM(c) AS BIGINT) AS n_rows,
         COUNT(*) AS n_keys,
         CAST(MAX(c) AS BIGINT) AS max_cnt,
         CAST(SUM(c) AS DOUBLE) / COUNT(*) AS avg_cnt,
         CAST(MAX(c) AS DOUBLE) / (CAST(SUM(c) AS DOUBLE) / COUNT(*)) AS skew_ratio,
         CAST(MIN(CASE WHEN c = (SELECT m FROM m2) THEN k END) AS BIGINT) AS top_key
  FROM c2
)
SELECT * FROM p1 UNION ALL SELECT * FROM p2
"""


def _key_skew_profile(df, label: str, col: str):
    counts = df.groupBy(F.col(col).alias("k")).agg(F.count(F.lit(1)).alias("c"))
    mx = counts.agg(F.max("c").alias("m"))
    avg = F.sum("c").cast("double") / F.count(F.lit(1))
    return (
        # bounded: 1-row max
        counts.crossJoin(F.broadcast(mx))
        .agg(
            F.lit(label).alias("key_col"),
            F.sum("c").cast("long").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("c").cast("long").alias("max_cnt"),
            avg.alias("avg_cnt"),
            (F.max("c").cast("double") / avg).alias("skew_ratio"),
            F.min(F.when(F.col("c") == F.col("m"), F.col("k")))
            .cast("long")
            .alias("top_key"),
        )
    )


@query("profile_join_key_skew", oracle=_SKEW_ORACLE,
       tags=("profiling", "skew", "diagnostics"))
def profile_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders, lineitem) = load(spark, sf_dir, "orders", "lineitem")
    return _key_skew_profile(orders, "orders.o_custkey", "o_custkey").unionByName(
        _key_skew_profile(lineitem, "lineitem.l_suppkey", "l_suppkey")
    )


# --- population stability index (distribution drift score) --------------------
# The standard model-monitoring drift metric between a reference and a
# current population: PSI = sum over buckets of (p - q) * ln(p / q).
# Fixture: even event_ids are the reference window, odd the current.
# Scale shape: ONE scan and ONE partial-agg shuffle produce the 10-row
# bucket table (count_if per side in the same groupBy); the spine join
# and totals are driver-size broadcasts on a 10-row relation. Laplace
# smoothing (+1 / +K) keeps empty buckets finite, so the metric is
# defined even when a bucket drains. ln() differs in the last ulp
# across libms -> round 9 (engine-wide transcendental convention).

_PSI_ORACLE = """
WITH ev AS (
  SELECT (event_id % 2 = 0) AS is_ref,
         LEAST(GREATEST(CAST(FLOOR(value / 50) AS BIGINT), 0), 9) AS bucket
  FROM events
),
cnt AS (
  SELECT bucket,
         COUNT(CASE WHEN is_ref THEN 1 END) AS n_ref,
         COUNT(CASE WHEN NOT is_ref THEN 1 END) AS n_cur
  FROM ev GROUP BY bucket
),
spine AS (SELECT CAST(range AS BIGINT) AS bucket FROM range(0, 10)),
filled AS (
  SELECT s.bucket,
         COALESCE(n_ref, 0) AS n_ref,
         COALESCE(n_cur, 0) AS n_cur
  FROM spine s LEFT JOIN cnt USING (bucket)
),
tot AS (
  SELECT CAST(SUM(n_ref) AS DOUBLE) AS tr,
         CAST(SUM(n_cur) AS DOUBLE) AS tc
  FROM filled
)
SELECT bucket,
       CAST(n_ref AS BIGINT) AS n_ref,
       CAST(n_cur AS BIGINT) AS n_cur,
       ROUND(((n_ref + 1.0) / (tr + 10.0) - (n_cur + 1.0) / (tc + 10.0))
             * LN(((n_ref + 1.0) / (tr + 10.0))
                  / ((n_cur + 1.0) / (tc + 10.0))), 9) AS psi_term
FROM filled, tot
ORDER BY bucket
"""


@query("profile_drift_psi", oracle=_PSI_ORACLE,
       tags=("profiling", "drift", "quality"))
def profile_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    ev = events.select(
        (F.col("event_id") % 2 == 0).alias("is_ref"),
        F.least(
            F.greatest(F.floor(F.col("value") / 50), F.lit(0)), F.lit(9)
        ).cast("long").alias("bucket"),
    )
    cnt = ev.groupBy("bucket").agg(
        F.count(F.when(F.col("is_ref"), 1)).alias("n_ref"),
        F.count(F.when(~F.col("is_ref"), 1)).alias("n_cur"),
    )
    spine = spark.range(10).select(F.col("id").alias("bucket"))
    filled = (
        spine.join(cnt, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    tot = filled.agg(
        F.sum("n_ref").cast("double").alias("tr"),
        F.sum("n_cur").cast("double").alias("tc"),
    )
    p = (F.col("n_ref") + 1.0) / (F.col("tr") + 10.0)
    q = (F.col("n_cur") + 1.0) / (F.col("tc") + 10.0)
    return (
        # bounded: 1-row totals
        filled.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.col("n_ref").cast("long").alias("n_ref"),
            F.col("n_cur").cast("long").alias("n_cur"),
            F.round((p - q) * F.log(p / q), 9).alias("psi_term"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Z-order layout diagnostics
# ---------------------------------------------------------------------------
# The write-side operator (operators/zorder.py, pytest-pinned) lays a
# table out along the Morton curve of two dimensions so min-max file
# stats prune on BOTH. This query is its oracle-checkable core: the
# interleave arithmetic itself, plus the property it buys — group rows
# by the top byte of their Morton key and every group's (user, time)
# bounding rectangle is small, which is exactly why per-file min-max
# stats stay narrow after a z-ordered write. The SAME expression text
# runs on both engines (only the integer-division token differs), so
# parity pins every shift/mask/clamp, not a reimplementation.

_Z_BITS = 8  # 2 dims x 8 bits -> 16-bit keys; key >> 8 = 256 layout cells


def _z_norm(v: str, lo: str, hi: str, div: str) -> str:
    # floor((v - lo) * 2^bits / span) clamped into [0, 2^bits - 1]; all
    # terms stay BIGINT (epoch-us deltas * 256 ~ 1.7e17 < 2^63), so the
    # arithmetic is exact on both engines — no double rounding anywhere.
    return (
        f"least(((({v}) - ({lo})) * {2**_Z_BITS}) {div} "
        f"greatest(({hi}) - ({lo}), 1), {2**_Z_BITS - 1})"
    )


def _z_key(nu: str, nt: str) -> str:
    # bit i of dimension j lands at position i*2 + j (user j=0, time
    # j=1) — the unrolled OR-of-shifts shape whole-stage codegen likes.
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({nu} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({nt} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)  # disjoint bit positions: + == OR


def _zorder_oracle() -> str:
    nu = _z_norm("u", "lo_u", "hi_u", "//")
    nt = _z_norm("t", "lo_t", "hi_t", "//")
    return f"""
WITH ev AS (
  SELECT user_id AS u, epoch_us(ts) AS t FROM events
),
stats AS (
  SELECT MIN(u) AS lo_u, MAX(u) AS hi_u, MIN(t) AS lo_t, MAX(t) AS hi_t
  FROM ev
),
keyed AS (
  SELECT u, t, {_z_key(f'({nu})', f'({nt})')} AS zkey
  FROM ev, stats
)
SELECT zkey >> {_Z_BITS} AS zbucket,
       COUNT(*) AS n_rows,
       MIN(u) AS u_min, MAX(u) AS u_max,
       MIN(t) AS t_min, MAX(t) AS t_max
FROM keyed
GROUP BY 1
"""


@query("layout_zorder_key_stats", oracle=_zorder_oracle(),
       tags=("layout", "profiling"))
def layout_zorder_key_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-key layout cells of events over (user_id, time).

    Plan: one 1-row min/max aggregate broadcast under a cross join (the
    normalization box — column-form of the stats row
    operators/zorder.py collects), then the interleave as pure long
    shift/mask arithmetic inside codegen, then ONE hash aggregation on
    the 256 cell ids. At any corpus size the shuffle carries 256 groups
    of 6 longs; the narrow per-cell (u, t) rectangles this emits are
    the data-skipping property a z-ordered write gives every file."""
    (events,) = load(spark, sf_dir, "events")
    ev = events.select(
        F.col("user_id").cast("long").alias("u"),
        F.unix_micros(F.col("ts_utc")).alias("t"),  # catalog's canonical ts
    )
    stats = ev.agg(
        F.min("u").alias("lo_u"), F.max("u").alias("hi_u"),
        F.min("t").alias("lo_t"), F.max("t").alias("hi_t"),
    )
    nu = _z_norm("u", "lo_u", "hi_u", "div")
    nt = _z_norm("t", "lo_t", "hi_t", "div")
    # bounded: 1-row min/max stats
    keyed = ev.crossJoin(F.broadcast(stats)).select(
        "u", "t", F.expr(_z_key(f"({nu})", f"({nt})")).alias("zkey")
    )
    return keyed.groupBy(
        F.shiftright("zkey", _Z_BITS).alias("zbucket")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("u").alias("u_min"), F.max("u").alias("u_max"),
        F.min("t").alias("t_min"), F.max("t").alias("t_max"),
    )
