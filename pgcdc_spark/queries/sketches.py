"""Mergeable distinct-count sketches: exact bitmap counting and
Apache DataSketches HLL.

Neither exists in the reference (no aggregation surface at all,
SURVEY.md §2.1); both are the standard engine answers to "how many
distinct X" at 100 TB, where a naive COUNT(DISTINCT) reshuffles raw
values:

- **bitmap**: `bitmap_construct_agg` packs each 32k-wide bucket of the
  key domain into a fixed 4 KB bitmap; distinct count = sum of
  `bitmap_count` over buckets. EXACT, mergeable (`bitmap_or_agg`), and
  the shuffle carries |buckets| bitmaps instead of |rows| values — the
  materialized-bitmap pattern every warehouse uses for repeated distinct
  queries over int keys.
- **HLL**: `hll_sketch_agg` (DataSketches HLL_4) — sub-percent-accuracy
  estimates in ~1.5 KB regardless of cardinality, unionable across
  partitions/days (`hll_union_agg`). The approximate path when the key
  domain is unbounded (URLs, doc hashes). Estimates are deterministic
  (register maxima are order-independent) but engine-specific, so the
  driver check is rows-only; tests/test_llm.py pins accuracy bounds and
  union-merge associativity instead.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from . import query

_BITMAP_ORACLE = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
"""


@query("agg_bitmap_distinct", oracle=_BITMAP_ORACLE, tags=("agg", "sketch"))
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counting via bucketed bitmaps.

    Stage 1 groups by (event_type, bucket) and ORs each user's bit into a
    4 KB bitmap — partial aggregation packs bits map-side, so the shuffle
    moves one bitmap per (group, bucket, partition), never raw ids.
    Stage 2 ORs bucket bitmaps per group and sums their popcounts. Two
    small shuffles, both carrying fixed-size state — the shape that keeps
    a distinct count over 10^12 rows bounded by |groups| x |id-domain| /
    32768 bitmaps. Oracle: plain COUNT(DISTINCT)."""
    (events,) = load(spark, sf_dir, "events")
    per_bucket = events.groupBy(
        "event_type", F.bitmap_bucket_number("user_id").alias("bucket")
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm"),
        F.count(F.lit(1)).alias("n"),
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).alias("n_users"),
        F.sum("n").alias("n_events"),
    )


@query("sketch_hll_distinct", oracle=None, tags=("agg", "sketch", "approx"))
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataSketches HLL distinct-user estimate per event type, computed
    the way a 100 TB pipeline stores it: per-group sketches built with
    `hll_sketch_agg` (map-side partial merge), then a second union level
    (`hll_union_agg`) proving the stored sketches re-merge to the global
    estimate without touching raw data again. Returns per-type estimates
    plus the all-types union — the pre-aggregated-rollup contract.
    No DuckDB analogue (engine-specific sketch encoding): driver checks
    rows-only; accuracy and merge associativity are pinned in pytest."""
    (events,) = load(spark, sf_dir, "events")
    per_type = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    est = per_type.select(
        "event_type", F.hll_sketch_estimate("sk").alias("n_users_est")
    )
    total = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_users_est")
    ).select(F.lit("__all__").alias("event_type"), "n_users_est")
    return est.unionByName(total)


# --- count-min sketch heavy-hitter estimation --------------------------------
# The mergeable frequency sketch (Cormode-Muthukrishnan 2005): d hash
# rows x w buckets of counters, update = +1 in one bucket per row,
# estimate = min over rows — always an OVERestimate, off by at most
# eps*N with high probability. The counter table is FIXED-SIZE (d*w
# cells) whatever the corpus size: partial aggregation reduces each
# partition to <= d*w rows before the one shuffle, and two sketches
# merge by cell-wise addition (the same rollup contract as the HLL and
# bitmap entries). Hashes are md5-derived, so BOTH engines compute the
# identical sketch — estimates are hash-checked exactly, and the CMS
# overestimate invariant (est >= true count) rides in the result.

_CMS_D = 4
_CMS_W = 32
_CMS_TOP = 25

_CMS_ORACLE = f"""
WITH tok AS (
  SELECT UNNEST(string_split(text, ' ')) AS t FROM documents
),
exact AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS exact_n FROM tok GROUP BY t
),
top AS (
  SELECT t, exact_n FROM exact ORDER BY exact_n DESC, t LIMIT {_CMS_TOP}
),
rows_ AS (SELECT UNNEST(range(0, {_CMS_D})) AS i),
counters AS (
  SELECT i,
         ('0x' || substr(md5(i || ':' || t), 1, 8))::BIGINT % {_CMS_W} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM tok, rows_ GROUP BY 1, 2
),
est AS (
  SELECT p.t, p.exact_n, MIN(c.c) AS cms_est
  FROM top p
  JOIN rows_ r ON TRUE
  JOIN counters c
    ON c.i = r.i
   AND c.bucket = ('0x' || substr(md5(r.i || ':' || p.t), 1, 8))::BIGINT % {_CMS_W}
  GROUP BY p.t, p.exact_n
)
SELECT t, exact_n, cms_est, cms_est - exact_n AS overestimate FROM est
"""


@query("docs_cms_heavy_hitters", oracle=_CMS_ORACLE,
       tags=("llm", "text", "sketch", "heavy-hitters"))
def docs_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min estimates for the top-{k} exact heavy hitters, computed
    from a {d}x{w} fixed-size counter table. md5-derived bucket hashing
    makes the sketch engine-identical, so the driver hash-checks the
    estimates AND the overestimate margins exactly."""
    (docs,) = load(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split("text", " ")).alias("t"))
    exact = tok.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
    top = exact.orderBy(F.col("exact_n").desc(), "t").limit(_CMS_TOP)

    def bucket(i_col, t_col):
        return F.conv(
            F.substring(F.md5(F.concat(i_col.cast("string"), F.lit(":"), t_col)
                              .cast("binary")), 1, 8), 16, 10
        ).cast("long") % _CMS_W

    rows_ = F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("i")
    counters = (
        tok.select("t", rows_)
        .select("i", bucket(F.col("i"), F.col("t")).alias("bucket"))
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    probes = top.select("t", "exact_n", rows_).select(
        "t", "exact_n", "i", bucket(F.col("i"), F.col("t")).alias("bucket")
    )
    return (
        # bounded: fixed CMS counter grid (depth x width)
        probes.join(F.broadcast(counters), ["i", "bucket"])
        .groupBy("t", "exact_n")
        .agg(F.min("c").alias("cms_est"))
        .select(
            "t", "exact_n", "cms_est",
            (F.col("cms_est") - F.col("exact_n")).alias("overestimate"),
        )
    )
