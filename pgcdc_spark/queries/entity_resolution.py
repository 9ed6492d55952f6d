"""Entity resolution (record linkage) over structured rows — blocking,
pairwise field similarity, and golden-record survivorship.

The reference forwards every CDC row unvalidated and unreconciled
(/root/reference/src/mapping/customMapper.ts:19-31 maps whatever
arrives; there is no identity reconciliation anywhere downstream), so a
consumer that receives the same real-world customer from two feeds —
or from one feed before and after a hand-edit — stores two rows. These
queries are that missing reconciliation step, built the way a 100 TB
engine has to build it:

- **never all-pairs**: candidate generation is a hash-equi-join on a
  BLOCKING KEY (stable name prefix + exact attributes). Blocks stay
  O(1)-sized as the corpus grows (a 5-digit prefix splits any key
  population into 10^5-way groups), so candidate volume is O(n), not
  O(n^2) — the same discipline as the MinHash band join in
  ``llm_dedup`` but over structured fields;
- **similarity only on candidates**: ``levenshtein`` runs on the
  block-joined pairs, never the cross product (Spark's built-in is
  codegen'd JVM; DuckDB's matches it exactly — classic
  Wagner-Fischer edit distance on both engines);
- **survivorship is a window, not a collect**: best-match-per-dirty-
  record is one ``row_number`` window with a total order (distance,
  then key — deterministic on both engines).

The "dirty feed" is derived deterministically inside the query (and
identically in the oracle): every 7th customer re-arrives with a new
surrogate key and a transposition typo in the last two name
characters — the classic fat-finger error that defeats exact matching
(the digits normalize differently) but sits at edit distance <= 2.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from ..catalog import load
from . import query

# Transpose the last two characters of c_name ('Customer#%09d' is 18
# chars): positions 17 and 18 swap. When the two digits are equal the
# transposition is the identity and the match is exact (lev = 0).
# (Built lazily — Columns need an active session.)
def _dirty_name_spark() -> Column:
    return F.concat(
        F.substring("c_name", 1, 16),
        F.substring("c_name", 18, 1),
        F.substring("c_name", 17, 1),
    )

_DIRTY_CTE = """
dirty AS (
  SELECT c_custkey + 1000000 AS d_custkey,
         substring(c_name, 1, 16) || substring(c_name, 18, 1)
           || substring(c_name, 17, 1) AS d_name,
         c_nationkey AS d_nationkey,
         c_mktsegment AS d_mktsegment,
         c_acctbal AS d_acctbal
  FROM customer
  WHERE c_custkey % 7 = 0
)
"""

_PAIRS_SQL = f"""
WITH {_DIRTY_CTE},
pairs AS (
  SELECT c.c_custkey AS clean_custkey,
         d.d_custkey AS dirty_custkey,
         CAST(levenshtein(c.c_name, d.d_name) AS BIGINT) AS lev,
         c.c_name AS golden_name,
         CAST(c.c_acctbal = d.d_acctbal AS BIGINT) AS bal_equal
  FROM customer c
  JOIN dirty d
    ON c.c_nationkey = d.d_nationkey
   AND c.c_mktsegment = d.d_mktsegment
   AND substring(c.c_name, 10, 5) = substring(d.d_name, 10, 5)
  WHERE levenshtein(c.c_name, d.d_name) <= 2
)
"""

_CANDIDATES_ORACLE = (
    _PAIRS_SQL
    + """
SELECT clean_custkey, dirty_custkey, lev,
       CAST(100 - 40 * lev AS BIGINT) AS score
FROM pairs
"""
)


def _dirty_customers(customer: DataFrame) -> DataFrame:
    return customer.filter((F.col("c_custkey") % 7) == 0).select(
        (F.col("c_custkey") + F.lit(1_000_000)).alias("d_custkey"),
        _dirty_name_spark().alias("d_name"),
        F.col("c_nationkey").alias("d_nationkey"),
        F.col("c_mktsegment").alias("d_mktsegment"),
        F.col("c_acctbal").alias("d_acctbal"),
    )


def _candidate_pairs(customer: DataFrame) -> DataFrame:
    """Block join + edit-distance filter. The blocking key uses the
    first five padded name digits (untouched by a last-two-character
    transposition) plus the exact attributes — block sizes are bounded
    by the prefix fan-out, so the join output is O(n) at any corpus."""
    # The dirty feed is CORPUS-SCALED (every 7th record), so the block
    # join must never broadcast it — same lesson as the dup-gram join
    # (llm_extra.py, sf10 OOM): pin the shuffled hash join, whose
    # per-partition build side is bounded by the block fan-out.
    dirty = _dirty_customers(customer).hint("shuffle_hash")
    joined = customer.join(
        dirty,
        (F.col("c_nationkey") == F.col("d_nationkey"))
        & (F.col("c_mktsegment") == F.col("d_mktsegment"))
        & (F.substring("c_name", 10, 5) == F.substring("d_name", 10, 5)),
    )
    lev = F.levenshtein(F.col("c_name"), F.col("d_name"))
    return joined.where(lev <= 2).select(
        F.col("c_custkey").alias("clean_custkey"),
        F.col("d_custkey").alias("dirty_custkey"),
        lev.cast("long").alias("lev"),
        F.col("c_name").alias("golden_name"),
        (F.col("c_acctbal") == F.col("d_acctbal")).cast("long").alias("bal_equal"),
    )


@query("er_candidate_pairs", oracle=_CANDIDATES_ORACLE, tags=("er", "join"))
def er_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked candidate pairs with an edit-distance score.

    One hash join on the blocking key, similarity on candidates only —
    the non-negotiable shape for record linkage at scale (all-pairs
    Levenshtein over 10^9 rows is 10^18 comparisons; blocked, it is
    O(n) pairs of O(1)-sized blocks)."""
    (customer,) = load(spark, sf_dir, "customer")
    pairs = _candidate_pairs(customer)
    return pairs.select(
        "clean_custkey",
        "dirty_custkey",
        "lev",
        (F.lit(100) - F.lit(40) * F.col("lev")).cast("long").alias("score"),
    )


_GOLDEN_ORACLE = (
    _PAIRS_SQL
    + """
SELECT dirty_custkey,
       clean_custkey AS matched_custkey,
       lev,
       golden_name,
       bal_equal,
       n_candidates
FROM (
  SELECT p.*,
         ROW_NUMBER() OVER (PARTITION BY dirty_custkey
                            ORDER BY lev, clean_custkey) AS rn,
         COUNT(*) OVER (PARTITION BY dirty_custkey) AS n_candidates
  FROM pairs p
)
WHERE rn = 1
"""
)


@query("er_golden_records", oracle=_GOLDEN_ORACLE, tags=("er", "window"))
def er_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship: each dirty record resolves to its best candidate
    (min edit distance, then min key — a total order, so the pick is
    deterministic on any partitioning) and carries the golden name
    forward. The ambiguity count (``n_candidates``) rides the same
    window pass — transposed neighbours like ...42 vs ...24 genuinely
    collide, which is exactly what a reviewer queue keys on."""
    (customer,) = load(spark, sf_dir, "customer")
    pairs = _candidate_pairs(customer)
    w = Window.partitionBy("dirty_custkey").orderBy("lev", "clean_custkey")
    wc = Window.partitionBy("dirty_custkey")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .withColumn("n_candidates", F.count(F.lit(1)).over(wc))
        .where(F.col("rn") == 1)
        .select(
            "dirty_custkey",
            F.col("clean_custkey").alias("matched_custkey"),
            "lev",
            "golden_name",
            "bal_equal",
            "n_candidates",
        )
    )
