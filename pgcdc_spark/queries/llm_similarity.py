"""Similarity search over `embeddings` (array<float>, 64-dim).

- `emb_cosine_topk`: brute-force cosine top-k — the correctness baseline,
  oracle-checked bit-for-bit (sequential double dot products both sides).
- `emb_lsh_ann_topk`: the scale path — deterministic random-hyperplane LSH
  buckets first, then top-k within bucket. At 100 TB the bucket join
  replaces the full cross product; rows-only driver check (the SQL
  formulation of the plane construction is impractical), but the operator
  is validated against brute force in tests/test_llm.py.

No UDFs: dot products are Catalyst higher-order functions (functions/
vectors.py); the cross join broadcasts the (small) query set so the big
side never shuffles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load
from ..functions.vectors import dot_unrolled, norm_sq, norm_unrolled
from . import query

_N_QUERIES = 8
_DIMS = 64  # fixed embedding dimensionality (TESTDATA.md)
_TOP_K = 10

_COSINE_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < {_N_QUERIES}
),
c AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
),
s AS (
  SELECT qid, vec_id,
    list_dot_product(qe, e)
      / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(e, e))) AS cosine
  FROM q, c
  WHERE qid <> vec_id
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
  FROM s
)
SELECT qid, vec_id AS neighbor_id, cosine, rank FROM r WHERE rank <= {_TOP_K}
"""


@query("emb_cosine_topk", oracle=_COSINE_ORACLE, tags=("llm", "similarity"))
def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = load(spark, sf_dir, "embeddings")
    # Norms are computed ONCE per vector before the join (not per pair):
    # per pair only the dot product remains — 1 fold instead of 3. Same
    # doubles as the oracle's per-pair sqrt(dot(x,x)) since the fold is
    # identical, so the quotient stays bit-identical.
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        norm_unrolled(F.col("embedding"), _DIMS).alias("qn"),
    )
    c = emb.select(
        "vec_id",
        F.col("embedding").alias("e"),
        norm_unrolled(F.col("embedding"), _DIMS).alias("n"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("vec_id"))
        .select(
            "qid",
            "vec_id",
            (dot_unrolled(F.col("qe"), F.col("e"), _DIMS)
             / (F.col("qn") * F.col("n"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("qid", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
    )


# --- LSH-bucketed ANN (scale path; validated vs brute force in tests) -------

_N_PLANES = 6  # 2^6 = 64 buckets


def _plane_sign(plane: int, dim: int) -> int:
    """Deterministic pseudo-random +-1 from a counter hash (no RNG: scripts
    must be reproducible across runs and engines)."""
    import hashlib

    h = hashlib.md5(f"{plane}_{dim}".encode()).hexdigest()
    return 1 if int(h[0], 16) % 2 == 0 else -1


def _bucket_expr(dims: int) -> F.Column:
    """Bit-pack the signs of <v, plane_p> into an int bucket id."""
    bucket = F.lit(0)
    for p in range(_N_PLANES):
        terms = None
        for d in range(dims):
            t = F.element_at(F.col("ed"), d + 1) * F.lit(float(_plane_sign(p, d)))
            terms = t if terms is None else terms + t
        bucket = bucket + F.when(terms >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


@query("emb_lsh_ann_topk", oracle=None, tags=("llm", "similarity", "lsh"))
def emb_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = load(spark, sf_dir, "embeddings")
    dims = 64
    base = (
        emb.select(
            "vec_id",
            F.col("embedding").alias("e"),
            F.col("embedding").cast("array<double>").alias("ed"),
        )
        .withColumn("bucket", _bucket_expr(dims))
        .withColumn("n", norm_unrolled(F.col("e"), _DIMS))
        .drop("ed")
    )
    q = base.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe"),
        F.col("bucket").alias("qbucket"), F.col("n").alias("qn"),
    )
    scored = (
        base.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .filter(F.col("qid") != F.col("vec_id"))
        .select(
            "qid",
            "vec_id",
            (dot_unrolled(F.col("qe"), F.col("e"), _DIMS)
             / (F.col("qn") * F.col("n"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("qid", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
    )


# --- vector norms / global stats (oracle-checked plumbing for the ANN ops) --

_NORM_ORACLE = """
SELECT
  label,
  COUNT(*) AS n_vectors,
  CAST(MIN(len(embedding)) AS BIGINT) AS min_dim,
  CAST(MAX(len(embedding)) AS BIGINT) AS max_dim,
  CAST(SUM(CAST(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                AS DECIMAL(28,9))) AS DOUBLE) AS sum_norm
FROM embeddings
GROUP BY label
ORDER BY label
"""


@query("emb_norm_stats", oracle=_NORM_ORACLE, tags=("llm", "similarity"))
def emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sum of L2 norms per label. Each norm is IEEE-exact (sequential fold +
    correctly-rounded sqrt); the order-dependent double SUM is made
    deterministic on both engines by the usual decimal-cast trick."""
    (emb,) = load(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label",
            F.col("embedding").alias("e"),
        )
        .select("label", "e", F.sqrt(norm_sq(F.col("e"))).alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min(F.size("e")).cast("long").alias("min_dim"),
            F.max(F.size("e")).cast("long").alias("max_dim"),
            F.sum(F.col("norm").cast("decimal(28,9)")).cast("double").alias("sum_norm"),
        )
    )
