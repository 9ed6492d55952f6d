"""Similarity search over `embeddings` (array<float>, 64-dim).

- `emb_cosine_topk`: brute-force cosine top-k — the correctness baseline,
  oracle-checked bit-for-bit (sequential double dot products both sides).
- `emb_lsh_ann_topk`: the scale path — deterministic random-hyperplane LSH
  buckets first, then top-k within bucket. At 100 TB the bucket join
  replaces the full cross product. Full-oracle since r8: the plane
  matrix is a VALUES table in the SQL, so the driver hash-checks the
  bucketing arithmetic itself; recall-vs-brute-force is additionally
  pinned in tests/test_llm.py.

No UDFs: dot products are Catalyst higher-order functions (functions/
vectors.py); the cross join broadcasts the (small) query set so the big
side never shuffles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load
from ..functions.vectors import dot_fold_expr, norm_fold_expr, norm_sq
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
        F.col("embedding").cast("array<double>").alias("qe"),
        norm_fold_expr("embedding", cast=True).alias("qn"),
    )
    c = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        norm_fold_expr("embedding", cast=True).alias("n"),
    )
    scored = (
        # bounded: fixed query set
        c.crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("vec_id"))
        .select(
            "qid",
            "vec_id",
            (dot_fold_expr("qe", "e")
             / (F.col("qn") * F.col("n"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("qid", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
    )


# --- contrastive triplet mining (hard negatives for embedding training) -----

_N_NEG = 5

_TRIPLET_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS qid, label AS ql, embedding::DOUBLE[] AS qe
  FROM embeddings WHERE vec_id < {_N_QUERIES}
),
c AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
),
s AS (
  SELECT qid, ql, vec_id, label,
    list_dot_product(qe, e)
      / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(e, e))) AS cosine
  FROM q, c
  WHERE qid <> vec_id
),
pos AS (
  SELECT qid, vec_id AS pos_id, cosine AS pos_cos,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
  FROM s WHERE label = ql
),
neg AS (
  SELECT qid, vec_id AS neg_id, cosine AS neg_cos,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
  FROM s WHERE label <> ql
)
SELECT n.qid, p.pos_id, p.pos_cos, n.neg_id, n.neg_cos, n.rank,
       p.pos_cos - n.neg_cos AS margin
FROM neg n LEFT JOIN (SELECT qid, pos_id, pos_cos FROM pos WHERE rn = 1) p
  ON n.qid = p.qid
WHERE n.rank <= {_N_NEG}
"""


@query("emb_triplet_mining", oracle=_TRIPLET_ORACLE,
       tags=("llm", "similarity", "training"))
def emb_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive (anchor, positive, hard-negative) triplet mining — the
    training-data op behind dense-retriever / embedding-model training
    (DPR, Karpukhin et al. '20: hard negatives — the most-similar items
    with a DIFFERENT label — train far better than random negatives).
    Per anchor: the hardest positive (top same-label neighbor) and the
    top-{_N_NEG} hard negatives, with the triplet margin pos_cos - neg_cos
    (the quantity a triplet loss drives positive).

    Scoring follows emb_cosine_topk's bit-exact discipline (norms folded
    once per vector, per-pair dot via the same fold the oracle uses).
    Anchors broadcast (bounded, fixed set), so the corpus side never
    shuffles for scoring. Both rankings share one logical window over
    (qid, same-label?); physically Catalyst pushes each branch's
    partition-key filter below its Window — the positive branch becomes
    an EQUI-join on label — and WindowGroupLimit prunes to top-k
    map-side, so each branch is a streaming corpus pass whose exchange
    carries only ~anchors x k rows. Two cheap passes with tiny shuffles,
    never one pass that shuffles the whole scored corpus. Margin is a
    subtraction of two bit-identical doubles — exact on both engines, no
    rounding needed. At a corpus-scaled anchor set the scale path is the
    persisted IVF index shortlist (probe -> label-filter -> exact
    re-rank, the emb_mmr_rerank_ann composition) — hard negatives only
    need the neighborhood, never the full corpus.
    A positive may not exist (singleton label): LEFT join keeps the
    anchor's negatives with NULL pos/margin rather than dropping them."""
    (emb,) = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("ql"),
        F.col("embedding").cast("array<double>").alias("qe"),
        norm_fold_expr("embedding", cast=True).alias("qn"),
    )
    c = emb.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("e"),
        norm_fold_expr("embedding", cast=True).alias("n"),
    )
    scored = (
        # bounded: fixed anchor set (_N_QUERIES rows)
        c.crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("vec_id"))
        .select(
            "qid",
            "ql",
            "vec_id",
            "label",
            (dot_fold_expr("qe", "e")
             / (F.col("qn") * F.col("n"))).alias("cosine"),
        )
    )
    # ONE window pass ranks positives and negatives together: partitioning
    # by (qid, same-label?) makes the two rankings the same exchange, so
    # the pos/neg branches below are ReusedExchange twins, not two
    # corpus-wide window shuffles.
    ranked = scored.withColumn(
        "same", F.col("label") == F.col("ql")
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("qid", "same")
            .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        ),
    )
    pos = (
        ranked.filter(F.col("same") & (F.col("rn") == 1))
        .select("qid", F.col("vec_id").alias("pos_id"),
                F.col("cosine").alias("pos_cos"))
    )
    neg = (
        ranked.filter(~F.col("same") & (F.col("rn") <= _N_NEG))
        .select("qid", F.col("vec_id").alias("neg_id"),
                F.col("cosine").alias("neg_cos"),
                F.col("rn").alias("rank"))
    )
    return (
        # bounded: at most one row per anchor, anchor set fixed
        neg.join(F.broadcast(pos), "qid", "left")
        .select(
            "qid", "pos_id", "pos_cos", "neg_id", "neg_cos", "rank",
            (F.col("pos_cos") - F.col("neg_cos")).alias("margin"),
        )
    )


# --- LSH-bucketed ANN (scale path; validated vs brute force in tests) -------
#
# Random-hyperplane LSH with OR-amplification: L tables of k planes each.
# A pair is a candidate iff it lands in the same bucket in ANY table —
# per-table collision prob for angle t is (1 - t/pi)^k, so L tables give
# recall 1 - (1 - (1 - t/pi)^k)^L on near neighbors while the candidate
# set stays ~L * n / 2^k per query instead of the n^2 cross product.

_N_TABLES = 8
_K_PLANES = 4  # 2^4 = 16 buckets per table


def _counter_sign(key: str) -> int:
    """Deterministic pseudo-random +-1 from a counter hash (no RNG: runs
    must be reproducible across engines and sessions). Shared by the LSH
    plane matrix and the JL projection matrix — both stringify the same
    signs into the Spark expression AND the DuckDB VALUES table, so the
    convention must have exactly one home."""
    import hashlib

    h = hashlib.md5(key.encode()).hexdigest()
    return 1 if int(h[0], 16) % 2 == 0 else -1


def _plane_sign(table: int, plane: int, dim: int) -> int:
    return _counter_sign(f"{table}_{plane}_{dim}")


def _buckets_expr(dims: int) -> F.Column:
    """``array<int>`` of one bucket id per table for the vector in ``e``.

    Built as ONE parsed SQL expression: the plane matrix is an inline
    array<array<double>> literal and the sign/bit-pack logic is nested
    higher-order functions. (Unrolling 8x4x64 terms into a py4j-built
    Column tree takes ~15 s to construct and stalls Catalyst; this parses
    in milliseconds and evaluates per VECTOR, not per pair, so the
    interpreted-lambda cost is negligible.)
    """
    planes = ", ".join(
        "array(" + ", ".join(
            f"{float(_plane_sign(t, p, d))}D" for d in range(dims)
        ) + ")"
        for t in range(_N_TABLES)
        for p in range(_K_PLANES)
    )
    return F.expr(
        f"""
        transform(sequence(0, {_N_TABLES - 1}), t ->
          aggregate(sequence(0, {_K_PLANES - 1}), 0, (acc, p) ->
            acc + IF(
              aggregate(
                zip_with(e, element_at(array({planes}), t * {_K_PLANES} + p + 1),
                         (x, w) -> x * w),
                0.0D, (a, x) -> a + x) >= 0D,
              shiftleft(1, p), 0)))
        """
    )


def _lsh_oracle() -> str:
    """Full SQL mirror of the LSH plan (r8 — previously rows-only): the
    32 deterministic +-1 hyperplanes become a VALUES table (with each
    plane's bit value precomputed as an integer), bucket ids are the
    same sign/bit-pack arithmetic over list_dot_product (the identical
    sequential fold as the engine's zip_with aggregate), and candidates
    join per (table, bucket) before exact-cosine ranking — so the driver
    hash-checks the bucketing itself, not just the top-k arithmetic."""
    rows = ", ".join(
        "({t}, {bv}, [{w}]::DOUBLE[])".format(
            t=t, bv=1 << p,
            w=", ".join(
                f"{float(_plane_sign(t, p, d))}" for d in range(_DIMS)
            ),
        )
        for t in range(_N_TABLES)
        for p in range(_K_PLANES)
    )
    return f"""
WITH c AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
),
planes(t, bv, w) AS (VALUES {rows}),
sig AS (
  SELECT c.vec_id, pl.t,
         CAST(SUM(CASE WHEN list_dot_product(c.e, pl.w) >= 0
                       THEN pl.bv ELSE 0 END) AS INT) AS bucket
  FROM c, planes pl GROUP BY c.vec_id, pl.t
),
cand AS (
  SELECT DISTINCT q.vec_id AS qid, s2.vec_id
  FROM sig q JOIN sig s2 ON q.t = s2.t AND q.bucket = s2.bucket
  WHERE q.vec_id < {_N_QUERIES} AND s2.vec_id <> q.vec_id
),
scored AS (
  SELECT cd.qid, cd.vec_id,
    list_dot_product(cq.e, cv.e)
      / (sqrt(list_dot_product(cq.e, cq.e)) * sqrt(list_dot_product(cv.e, cv.e)))
      AS cosine
  FROM cand cd JOIN c cq ON cq.vec_id = cd.qid JOIN c cv ON cv.vec_id = cd.vec_id
)
SELECT qid, vec_id AS neighbor_id, cosine, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= {_TOP_K}
"""


@query("emb_lsh_ann_topk", oracle=_lsh_oracle(), tags=("llm", "similarity", "lsh"))
def emb_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = load(spark, sf_dir, "embeddings")
    base = (
        emb.select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("e"),
        )
        .withColumn("n", norm_fold_expr("e"))
        .select(
            "vec_id", "e", "n",
            F.posexplode(_buckets_expr(_DIMS)).alias("t", "bucket"),
        )
    )
    q = base.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe"),
        F.col("n").alias("qn"), F.col("t").alias("qt"), F.col("bucket").alias("qbucket"),
    )
    # Score per (table) collision, then dedup on the scalar result columns:
    # a pair colliding in several tables yields identical rows, so DISTINCT
    # after scoring avoids a join-back for the vector payloads.
    scored = (
        base.join(
            # bounded: fixed query set
            F.broadcast(q),
            (F.col("t") == F.col("qt")) & (F.col("bucket") == F.col("qbucket")),
        )
        .filter(F.col("qid") != F.col("vec_id"))
        .select(
            "qid",
            "vec_id",
            (dot_fold_expr("qe", "e")
             / (F.col("qn") * F.col("n"))).alias("cosine"),
        )
        .distinct()
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("qid", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
    )


# --- int8 scalar quantization (the ANN memory-reduction step) ----------------
# At 100 TB of float32 embeddings, the index working set is the problem:
# scalar quantization to uint8 codes cuts it 4x (the standard first step
# before IVF/PQ serving). Two passes, both shuffle-light:
#   1. per-dimension min/max — a 64-group aggregate with map-side partial
#      combine, so the full scan reduces to 64 rows before any shuffle;
#   2. codes — the stats join back via broadcast (64 rows), quantization
#      is elementwise codegen'd arithmetic, and the per-vector code string
#      is assembled with ONE shuffle on vec_id.
# code(v) = floor((v - lo_d) / (hi_d - lo_d) * 255 + 0.5): elementwise IEEE
# double ops in an identical structure on both engines (floor(x+0.5), not
# round(), whose half-even behavior differs across engines), so the integer
# codes are bit-exact parity.

_QUANT_ORACLE = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
x AS (
  SELECT vec_id, t.i, v[t.i] AS val
  FROM e, (SELECT UNNEST(range(1, 65)) AS i) t
),
stats AS (
  SELECT i, MIN(val) AS lo, MAX(val) AS hi FROM x GROUP BY i
),
codes AS (
  SELECT vec_id, x.i,
         CAST(floor((val - lo) / (hi - lo) * 255.0 + 0.5) AS BIGINT) AS code
  FROM x JOIN stats ON x.i = stats.i
)
SELECT vec_id,
       string_agg(code::VARCHAR, ':' ORDER BY i) AS codes,
       CAST(SUM(code) AS BIGINT) AS code_sum
FROM codes GROUP BY vec_id
"""


@query("emb_quantize_int8", oracle=_QUANT_ORACLE, tags=("llm", "similarity", "quantize"))
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = load(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("i0", "val"),
    )
    stats = x.groupBy("i0").agg(F.min("val").alias("lo"), F.max("val").alias("hi"))
    # bounded: 64 per-dimension stat rows
    codes = x.join(F.broadcast(stats), "i0").select(
        "vec_id",
        "i0",
        F.floor((F.col("val") - F.col("lo")) / (F.col("hi") - F.col("lo")) * 255.0 + 0.5)
        .cast("long")
        .alias("code"),
    )
    # Re-assemble per-vector code vectors: collect_list is unordered under
    # parallel aggregation, so sort the (dim, code) structs — struct order
    # is lexicographic on the leading field — before serializing.
    return codes.groupBy("vec_id").agg(
        F.concat_ws(
            ":",
            F.transform(
                F.array_sort(F.collect_list(F.struct("i0", "code"))),
                lambda s: s["code"].cast("string"),
            ),
        ).alias("codes"),
        F.sum("code").alias("code_sum"),
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


# --- IVF-style ANN (coarse quantizer -> probe nprobe cells -> exact rank) ---
#
# The scale path complementing the LSH variant: a small deterministic
# centroid set acts as the coarse quantizer (a stand-in for k-means,
# chosen so DuckDB can mirror it and results are reproducible). Every
# vector is assigned to its nearest centroid (broadcast of the centroid
# table — the n x |C| scoring never shuffles the big side); each query
# probes its `nprobe` nearest cells and ranks exactly within them.
# |C| is ADAPTIVE ~ sqrt(n) (donor rule vec_id % M == 1 % M with
# M = max(1, n // ceil(sqrt(n))), M derived from the training-set count
# INSIDE the plan — an agg + broadcast cross join, so builds stay
# job-free): a fixed modulus made nlist grow LINEARLY with the corpus
# and the n x |C| assignment QUADRATIC — measured at 10x scale
# (SCALE_SF1.json predecessor run) before this fix. sqrt(n) cells is
# the production IVF shape (FAISS guideline nlist ~ sqrt(N)):
# assignment is O(n^1.5) total but map-only per row, cells hold ~sqrt(n)
# members, and the candidate join shuffles on cell id — cells are the
# partitioning unit, which is exactly how a distributed IVF index
# shards. Fully oracle-checked (unlike the LSH variant): recall loss vs
# brute force is deterministic given the fixed quantizer, so both
# engines agree.

_N_PROBE = 2


def cent_mod_sql(src: str = "e") -> str:
    """The adaptive modulus as a DuckDB scalar subquery over ``src``
    (any relation/derived table with one row per training vector)."""
    # explicit FLOOR: DuckDB's // does not floor when an operand is
    # DOUBLE (CEIL returns DOUBLE), it behaves like plain division
    return (f"(SELECT GREATEST(1, CAST(FLOOR(COUNT(*)"
            f" / CEIL(SQRT(COUNT(*)))) AS BIGINT)) FROM {src} AS __ts)")


def cent_rule_sql(extra_where: str = "") -> str:
    """The full donor predicate for a ``cent`` CTE selecting FROM e:
    ``extra_where`` restricts the TRAINING SET (e.g. the incremental
    index trains only on its base split) — it scopes both the count the
    modulus is derived from and the donor rows themselves, mirroring
    the engine's ``ivf_centroids(base_subset)``."""
    src = f"(SELECT vec_id FROM e WHERE {extra_where})" if extra_where else "e"
    mod = cent_mod_sql(src)
    pred = f"vec_id % {mod} = 1 % {mod}"
    return f"({extra_where}) AND {pred}" if extra_where else pred


def adaptive_donor_filter(df: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Rows of ``df`` whose ``id_col`` satisfies the adaptive donor rule
    ``id % M == 1 % M`` (the ``1 % M`` form makes M=1 mean "every row",
    so a 1-2 vector corpus still trains a quantizer). Lazy: the count
    rides the plan as a broadcast scalar — no job at build time."""
    mod_df = df.agg(
        F.greatest(
            F.lit(1),
            F.floor(F.count("*") / F.ceil(F.sqrt(F.count("*")))),
        ).cast("long").alias("__cmod")
    )
    return (
        # bounded: 1-row aggregate
        df.crossJoin(F.broadcast(mod_df))
        .filter(F.col(id_col) % F.col("__cmod") == F.lit(1) % F.col("__cmod"))
        .drop("__cmod")
    )


def ivf_centroids(base: DataFrame, cent_mod: int | None = None) -> DataFrame:
    """Deterministic coarse-quantizer centroids (k-means stand-in: the
    adaptive sqrt(n) donor rule above, DuckDB-mirrorable via
    cent_rule_sql). ``base`` must have columns (vec_id, e: array<double>,
    n: norm); it is also the TRAINING SET the modulus is derived from.
    ``cent_mod`` pins a fixed modulus (tests / frozen-quantizer replay)."""
    donors = (
        base.filter(F.col("vec_id") % cent_mod == 1 % cent_mod)
        if cent_mod is not None
        else adaptive_donor_filter(base)
    )
    return donors.select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce"), F.col("n").alias("cn")
    )


def nearest_cells(side: DataFrame, cent: DataFrame, id_col: str, k: int) -> DataFrame:
    """Assign each row of ``side`` (id_col, e, n) to its ``k`` nearest
    centroid cells by cosine. Centroids broadcast (|C| ~ sqrt(n) rows), so
    the big side never shuffles for the scoring.

    k=1 (the corpus-sized ASSIGNMENT path) reduces via a partial-
    aggregable argmax — max(struct(ccos, -cid)) picks the highest cosine
    with the lowest cid on ties, exactly the window's (ccos DESC, cid)
    order, and integer negation is exact — so the shuffle moves ONE
    combined row per vector instead of |C| scored copies of its
    64-double array (measured 30 s -> ~6 s at the 10x corpus; the window
    form shuffled the array once per centroid). k>1 (the PROBE path,
    |queries| rows) keeps the per-id window — its input is tiny."""
    # bounded: sqrt(n) centroids (measured through sf10) — nearest_cells_sharded is the past-broadcast-budget fallback
    scored = side.crossJoin(F.broadcast(cent)).select(
        id_col, "e", "n", "cid",
        (dot_fold_expr("e", "ce") / (F.col("n") * F.col("cn"))).alias("ccos"),
    )
    if k == 1:
        agg = scored.groupBy(id_col).agg(
            F.max(F.struct(F.col("ccos"),
                           (-F.col("cid")).alias("negcid"))).alias("m"),
            F.first("e").alias("e"),   # every copy of an id carries the
            F.first("n").alias("n"),   # same vector — any first is exact
        )
        return agg.select(id_col, "e", "n",
                          (-F.col("m.negcid")).alias("cid"))
    w = Window.partitionBy(id_col).orderBy(F.col("ccos").desc(), F.col("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(id_col, "e", "n", "cid")
    )


def nearest_cells_sharded(side: DataFrame, cent: DataFrame, id_col: str,
                          n_shards: int, n_salts: int = 8,
                          k: int = 1) -> DataFrame:
    """Cell assignment WITHOUT broadcasting the coarse quantizer — the
    past-the-broadcast-bound fallback for ``nearest_cells``. ``k=1`` is
    the corpus-sized ASSIGNMENT path (partial-aggregable argmax); k>1 is
    the PROBE path (per-id window over the shuffle-scored rows — its
    input is |queries| x |C| scalars, and the quantizer-memory bound
    still holds: no task ever builds more than |C|/n_shards centroids).

    Why it exists (the design limit of the broadcast path): under the
    adaptive rule |C| = ceil(sqrt(n)), a true 100 TB embeddings corpus
    (~2e11 rows at 64 float64 dims ≈ 512 B/vector) trains
    |C| ≈ sqrt(2e11) ≈ 4.5e5 centroids — |C| x d x 8 B ≈ 230 MB of raw
    arrays, several times that as a deserialized broadcast relation,
    re-shipped to every executor.  Fine through sf10 (measured,
    SCALE_SF1.json), not free at 100 TB.  FAISS hits the same wall and
    swaps the flat coarse quantizer for an HNSW one; the declarative
    equivalent is swapping the BROADCAST for a SHUFFLE plan in which no
    task ever holds more than |C|/n_shards centroids:

    - centroids are split into ``n_shards`` shards (cid % n_shards) and
      replicated across ``n_salts`` salts (so the shard join fans out to
      n_shards x n_salts partitions instead of hot-spotting n rows into
      n_shards tasks);
    - each vector is replicated once per shard (its salt is fixed by
      hash(id)), so every (vector, centroid) pair is scored EXACTLY once
      — at (shard(cid), salt(id));
    - the per-id argmax is the same partial-aggregable
      max(struct(ccos, -cid)) as the broadcast path; max over doubles is
      exact and order-free, so the result is IDENTICAL row-for-row
      (pinned by tests/test_llm.py::test_sharded_assignment_equivalence).

    Cost vs broadcast: the big side shuffles n_shards copies of each
    vector instead of zero — the price of bounding per-task quantizer
    memory.  Pick ``n_shards = ceil(|C| * d * 8 B / 64 MB)`` (the
    session broadcast budget): below 1 the broadcast path is strictly
    better, which is why ``ivf_cell_assignments`` defaults to it."""
    shard_ids = F.explode(
        F.sequence(F.lit(0), F.lit(n_shards - 1))).alias("__shard")
    side_rep = side.select(id_col, "e", "n", shard_ids).withColumn(
        "__salt", F.pmod(F.hash(F.col(id_col)), F.lit(n_salts)))
    cent_rep = cent.withColumn(
        "__shard", F.pmod(F.col("cid"), F.lit(n_shards))
    ).select(
        "cid", "ce", "cn", "__shard",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt"),
    )
    # shuffle_hash pinned: the centroid slice is the bounded build side;
    # never let a size estimate promote either side to broadcast — the
    # whole point of this path is that the quantizer does not fit one.
    scored = side_rep.join(
        cent_rep.hint("shuffle_hash"), ["__shard", "__salt"]
    ).select(
        id_col, "e", "n", "cid",
        (dot_fold_expr("e", "ce") / (F.col("n") * F.col("cn"))).alias("ccos"),
    )
    if k > 1:
        w = Window.partitionBy(id_col).orderBy(
            F.col("ccos").desc(), F.col("cid"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select(id_col, "e", "n", "cid")
        )
    agg = scored.groupBy(id_col).agg(
        F.max(F.struct(F.col("ccos"),
                       (-F.col("cid")).alias("negcid"))).alias("m"),
        F.first("e").alias("e"),
        F.first("n").alias("n"),
    )
    return agg.select(id_col, "e", "n", (-F.col("m.negcid")).alias("cid"))


def assign_cells(side: DataFrame, cent: DataFrame, id_col: str,
                 k: int = 1,
                 assignment_shards: int | None = None) -> DataFrame:
    """THE one home for the broadcast-vs-sharded dispatch rule: every
    cell assignment or probe in the engine routes through here, so the
    threshold (shards set and > 1 -> sharded shuffle join, else
    broadcast) cannot drift between call sites (r12 review). Both paths
    are row-identical (pinned by test_llm.py equivalence tests)."""
    if assignment_shards is not None and assignment_shards > 1:
        return nearest_cells_sharded(side, cent, id_col, assignment_shards,
                                     k=k)
    return nearest_cells(side, cent, id_col, k)


def ivf_cell_assignments(emb: DataFrame, cent_mod: int | None = None,
                         assignment_shards: int | None = None) -> DataFrame:
    """``vec_id -> nearest cell`` (plus the vector and its norm): the IVF
    blocking key reused by embedding dedup — at 100 TB cells are the
    shuffle/partitioning unit for any within-cell pair work.

    ``assignment_shards``: None (default) broadcasts the sqrt(n)
    quantizer — correct and fastest through the measured sf10 decade;
    set it (rule: ceil(|C| x d x 8 B / broadcast budget)) once the
    quantizer outgrows a broadcast — see ``nearest_cells_sharded``."""
    base = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        norm_fold_expr("embedding", cast=True).alias("n"),
    )
    cent = ivf_centroids(base, cent_mod)
    return assign_cells(base, cent, "vec_id", k=1,
                        assignment_shards=assignment_shards)

_IVF_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
cent AS (
  SELECT vec_id AS cid, v AS cv FROM e WHERE {cent_rule_sql()}
),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        list_dot_product(e.v, c.cv)
          / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
        DESC, c.cid) AS rn
    FROM e, cent c
  ) WHERE rn = 1
),
probe AS (
  SELECT qid, cid FROM (
    SELECT q.vec_id AS qid, c.cid,
      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        list_dot_product(q.v, c.cv)
          / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.cv, c.cv)))
        DESC, c.cid) AS rn
    FROM e q, cent c WHERE q.vec_id < {_N_QUERIES}
  ) WHERE rn <= {_N_PROBE}
),
cand AS (
  SELECT p.qid, a.vec_id
  FROM probe p JOIN asg a ON a.cid = p.cid
  WHERE a.vec_id <> p.qid
),
scored AS (
  SELECT c.qid, c.vec_id,
    list_dot_product(q.v, e.v)
      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))) AS cosine
  FROM cand c
  JOIN e q ON q.vec_id = c.qid
  JOIN e   ON e.vec_id = c.vec_id
)
SELECT qid, vec_id AS neighbor_id, cosine, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= {_TOP_K}
"""


@query("emb_ivf_ann_topk", oracle=_IVF_ORACLE, tags=("llm", "similarity", "ivf"))
def emb_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = load(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        norm_fold_expr("embedding", cast=True).alias("n"),
    )
    cent = ivf_centroids(base)
    asg = nearest_cells(base, cent, "vec_id", 1)
    probe = nearest_cells(
        base.filter(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("qid"), "e", "n"),
        cent, "qid", _N_PROBE,
    ).select("qid", F.col("e").alias("qe"), F.col("n").alias("qn"), "cid")
    scored = (
        # bounded: queries x nprobe cells
        asg.join(F.broadcast(probe), "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "vec_id",
            (dot_fold_expr("qe", "e")
             / (F.col("qn") * F.col("n"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("qid", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
    )


# --- semantic dedup (SemDeDup shape: within-cell cosine pruning) --------------
# Abbas et al., "SemDeDup" (2023): cluster the embedding space, compare
# pairs ONLY within a cluster, and drop all but one member of each
# semantic-duplicate group. The cluster (here: the deterministic IVF
# cell) bounds the quadratic — pair scoring is O(sum cell^2), never
# O(corpus^2), and each cell's pairs co-locate in one shuffle partition
# group keyed by cid. Keep rule: a vector is dropped iff some
# smaller-id vector in its cell clears the cosine threshold (keep-first
# deterministic canonical, the same discipline as dedup_keep_best).
# Every vector reports its best in-cell neighbor, so the query also
# serves as the threshold-tuning diagnostic.

_SEMDEDUP_TAU = 0.40

_SEMDEDUP_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
cent AS (
  SELECT vec_id AS cid, v AS cv FROM e WHERE {cent_rule_sql()}
),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        list_dot_product(e.v, c.cv)
          / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
        DESC, c.cid) AS rn
    FROM e, cent c
  ) WHERE rn = 1
),
pairs AS (
  SELECT a.vec_id, a.cid, b.vec_id AS other_id,
    list_dot_product(x.v, y.v)
      / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) AS cosine
  FROM asg a
  JOIN asg b ON b.cid = a.cid AND b.vec_id <> a.vec_id
  JOIN e x ON x.vec_id = a.vec_id
  JOIN e y ON y.vec_id = b.vec_id
),
best AS (
  SELECT vec_id, cid, other_id AS best_neighbor, cosine AS best_cos
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY cosine DESC, other_id) AS rn
    FROM pairs
  ) WHERE rn = 1
),
drops AS (
  SELECT DISTINCT vec_id FROM pairs
  WHERE cosine >= {_SEMDEDUP_TAU} AND other_id < vec_id
)
SELECT b.vec_id, b.cid, b.best_neighbor, b.best_cos,
       (d.vec_id IS NOT NULL) AS dropped
FROM best b LEFT JOIN drops d ON d.vec_id = b.vec_id
"""


@query("emb_semantic_dedup", oracle=_SEMDEDUP_ORACLE,
       tags=("llm", "similarity", "dedup", "semdedup"))
def emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication: IVF cells bound the
    pairwise cosine work, each vector reports its best in-cell neighbor,
    and keep-first canonicals drop any vector semantically covered by a
    smaller id. One shuffle on cid for the self-join, one per-vec_id
    window — no corpus cross join anywhere."""
    (emb,) = load(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        norm_fold_expr("embedding", cast=True).alias("n"),
    )
    from ..cache import shared

    cent = ivf_centroids(base)
    # shared(): asg feeds BOTH sides of the cell self-join and pairs
    # feeds both the best-neighbor window and the drop rule — unshared,
    # the physical plan inlines the assignment (centroid crossJoin +
    # argmin window) twice and the O(sum cell^2) pair scoring twice
    # (14 shuffle exchanges, plans/r13/emb_semantic_dedup_before.txt).
    # Persisting computes each once; pairs is the same O(sum cell^2)
    # object the shuffle already materializes, MEMORY_AND_DISK spills.
    asg = shared(
        nearest_cells(base, cent, "vec_id", 1).select("vec_id", "e", "n", "cid"))
    other = asg.select(
        F.col("vec_id").alias("other_id"),
        F.col("e").alias("oe"),
        F.col("n").alias("on_"),
        "cid",
    )
    pairs = shared(
        asg.join(other, "cid")
        .filter(F.col("other_id") != F.col("vec_id"))
        .select(
            "vec_id", "cid", "other_id",
            (dot_fold_expr("e", "oe") / (F.col("n") * F.col("on_"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("other_id")
    )
    best = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid", F.col("other_id").alias("best_neighbor"),
                F.col("cosine").alias("best_cos"))
    )
    drops = (
        pairs.filter(
            (F.col("cosine") >= _SEMDEDUP_TAU)
            & (F.col("other_id") < F.col("vec_id"))
        )
        .select("vec_id")
        .distinct()
        .withColumn("dropped_flag", F.lit(True))
    )
    return (
        best.join(drops, "vec_id", "left")
        .select(
            "vec_id", "cid", "best_neighbor", "best_cos",
            F.coalesce("dropped_flag", F.lit(False)).alias("dropped"),
        )
    )


# --- k-means (Lloyd) over embeddings, declaratively unrolled ------------------
# The clustering primitive under SemDeDup/IVF when the quantizer is
# learned rather than rule-seeded: seed k centers (the deterministic
# donor rule, so both engines agree), then TWO Lloyd iterations —
# assign-to-nearest, recompute means — expressed as pure DataFrame
# algebra with the iterations UNROLLED: no driver loop, no collect, the
# whole refinement is one lazy plan Catalyst sees end-to-end.
#
# Scale shape (round-7 bench fix): assignment scores FULL ARRAYS against
# broadcast centroid arrays via the shared sequential dot folds —
# d2 = dot(x,x) + dot(c,c) - 2 dot(x,c) with the self-dots precomputed
# once per side — exactly the nearest_cells/IVF shape (O(n * k) fold
# rows, one argmin window per vector). The first cut exploded vectors to
# (vec, dim) rows and joined on the 64-value dim key: a 64-way fan-out
# of the corpus per iteration that measured 11 s at sf0.1 vs ~2 s for
# this plan. Dims explode ONLY for the mean update, whose coordinate
# sums go through exact order-free decimals before double division; the
# updated centers fold back into arrays (sorted collect) for the next
# assignment. All arithmetic mirrors the oracle expression-for-
# expression, so assignments and distances stay bit-identical.


def _km_assign(pts: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, cid, dist2): nearest center per vector — broadcast
    centroid arrays, three shared dot folds, deterministic cid
    tie-break."""
    d2 = (
        F.col("ee") + F.col("cc") - 2 * dot_fold_expr("e", "cv")
    ).alias("dist2")
    # bounded: k fixed k-means centers
    scored = pts.crossJoin(F.broadcast(cent)).select("vec_id", "cid", d2)
    w = Window.partitionBy("vec_id").orderBy("dist2", "cid")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid", "dist2")
    )


# Exactness of the coordinate means (round-7 sf0.1 finding): casting a
# RAW float32-derived double to DECIMAL(28,9) can land exactly on a
# half-grid tie (binary fractions terminate with digit 5), and the two
# engines round such ties differently — a ~1e-12 mean divergence that
# the fold-based distances then expose. Scaling by 2^43 first makes
# every term an exact INTEGER double (float32 mantissa is 24 bits and
# the corpus magnitudes are >= 2^-19, so x * 2^43 has no fraction):
# integer-valued casts cannot tie, the decimal sum is exact, and the
# final double division is the same IEEE op on both engines.
_KM_SCALE = float(1 << 43)


def _km_update(pts: DataFrame, asg: DataFrame) -> DataFrame:
    """(cid, cv, cc): per-cluster coordinate-mean centers rebuilt as
    arrays — integer-exact scaled sums, double division, sorted-dim
    collect."""
    # Join FIRST, posexplode AFTER (guide §3.3): exploding 64 dims per
    # vector before the vec_id join shuffled dims x vectors narrow rows;
    # joining the un-exploded vectors moves 1/64th the rows through the
    # exchange and the explode then runs map-side above it.
    dims = pts.select("vec_id", "e").join(
        asg.select("vec_id", "cid"), "vec_id"
    ).select("vec_id", "cid", F.posexplode("e").alias("d", "x"))
    means = dims.groupBy("cid", "d").agg(
        (
            F.sum((F.col("x") * _KM_SCALE).cast("decimal(38,0)"))
            .cast("double")
            / (F.count(F.lit(1)) * _KM_SCALE)
        ).alias("c")
    )
    cent = means.groupBy("cid").agg(
        F.expr("transform(array_sort(collect_list(struct(d, c))), p -> p.c)")
        .alias("cv")
    )
    return cent.select("cid", "cv", dot_fold_expr("cv", "cv").alias("cc"))


_KMEANS_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS ee
  FROM embeddings
),
c0 AS (
  SELECT vec_id AS cid, v AS cv, list_dot_product(v, v) AS cc
  FROM e WHERE {cent_rule_sql()}
),
a1 AS (
  SELECT vec_id, cid, dist2 FROM (
    SELECT p.vec_id, c.cid,
           p.ee + c.cc - 2 * list_dot_product(p.v, c.cv) AS dist2,
           ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
             p.ee + c.cc - 2 * list_dot_product(p.v, c.cv), c.cid) AS rn
    FROM e p, c0 c
  ) WHERE rn = 1
),
m1 AS (
  SELECT a.cid, t.d AS d,
         CAST(SUM(CAST(p.v[t.d + 1] * {_KM_SCALE!r} AS DECIMAL(38,0))) AS DOUBLE)
           / (COUNT(*) * {_KM_SCALE!r}) AS c
  FROM e p
  JOIN a1 a USING (vec_id),
  (SELECT UNNEST(range(0, {_DIMS})) AS d) t
  GROUP BY a.cid, t.d
),
c1 AS (
  SELECT cid, list(c ORDER BY d) AS cv FROM m1 GROUP BY cid
),
c1c AS (
  SELECT cid, cv, list_dot_product(cv, cv) AS cc FROM c1
),
a2 AS (
  SELECT vec_id, cid, dist2 FROM (
    SELECT p.vec_id, c.cid,
           p.ee + c.cc - 2 * list_dot_product(p.v, c.cv) AS dist2,
           ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
             p.ee + c.cc - 2 * list_dot_product(p.v, c.cv), c.cid) AS rn
    FROM e p, c1c c
  ) WHERE rn = 1
)
SELECT vec_id, cid AS cluster_id, dist2 FROM a2
"""


@query("emb_kmeans_lloyd", oracle=_KMEANS_ORACLE,
       tags=("llm", "similarity", "clustering", "kmeans"))
def emb_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled Lloyd iterations over the embedding corpus: donor-
    seeded centers -> assign (broadcast arrays, dot folds) -> exact-
    decimal mean update -> re-assign, returning every vector's final
    cluster and squared distance. Declarative iteration (no driver loop,
    no collect) — the refinement is one plan; a production k-means
    iterates this block with the graph/CC driver-loop discipline once
    iteration count is data-dependent."""
    (emb,) = load(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
    ).withColumn("ee", dot_fold_expr("e", "e"))
    c0 = adaptive_donor_filter(pts).select(
        F.col("vec_id").alias("cid"),
        F.col("e").alias("cv"),
        F.col("ee").alias("cc"),
    )
    a1 = _km_assign(pts, c0)
    c1 = _km_update(pts, a1)
    a2 = _km_assign(pts, c1)
    return a2.select("vec_id", F.col("cid").alias("cluster_id"),
                     F.col("dist2"))


# --- IVF recall@k diagnostic --------------------------------------------------
# The number every ANN deployment watches: how much of the exact top-k
# does the pruned index recover per query? Composes the two existing
# plans — brute-force cosine top-k (ground truth) and IVF nprobe top-k —
# with one semi-overlap count per query. Both sides are deterministic,
# so the recall fractions are exact on both engines. Scale: ground truth
# here is the O(n*q) brute-force baseline (q = 8 probes); in production
# this query runs on a sampled query set, which is exactly its shape —
# the corpus-sized work is the two plans it already composes.

_RECALL_ORACLE = f"""
WITH bf AS (SELECT qid, neighbor_id FROM ({_COSINE_ORACLE})),
ivf AS (SELECT qid, neighbor_id FROM ({_IVF_ORACLE}))
SELECT b.qid,
       CAST(COUNT(i.neighbor_id) AS BIGINT) AS n_hits,
       CAST({_TOP_K} AS BIGINT) AS k,
       CAST(COUNT(i.neighbor_id) AS DOUBLE) / {_TOP_K} AS recall_at_k
FROM bf b
LEFT JOIN ivf i ON i.qid = b.qid AND i.neighbor_id = b.neighbor_id
GROUP BY b.qid
"""


@query("emb_ivf_recall_at_k", oracle=_RECALL_ORACLE,
       tags=("llm", "similarity", "ivf", "diagnostics"))
def emb_ivf_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@k of the IVF(nprobe) index against the exact
    brute-force top-k — the ANN quality gauge run when tuning n_cells /
    nprobe. Reuses both existing query plans and adds one per-qid
    overlap count (the join keys are two k-row-per-query sets, tiny)."""
    bf = emb_cosine_topk(spark, sf_dir).select("qid", "neighbor_id")
    ivf = emb_ivf_ann_topk(spark, sf_dir).select(
        "qid", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        bf.join(ivf, ["qid", "neighbor_id"], "left")
        .groupBy("qid")
        .agg(
            F.count("hit").alias("n_hits"),
            F.lit(_TOP_K).cast("long").alias("k"),
            (F.count("hit").cast("double") / _TOP_K).alias("recall_at_k"),
        )
    )


# --- IVF nprobe operating curve (cost + recall per probe level) ---------------
# The serving-side twin of dedup_lsh_bucket_profile (r11): before anyone
# flips nprobe in production, this is the table they read — per query
# and per nprobe level, the CANDIDATE COST (how many vectors the probe
# will score) and the RECALL@k it buys. Two deliberately different cost
# models in one query:
#
# - ``n_candidates`` comes from the assignment's per-CELL sizes joined
#   to the ranked probe cells — O(cells) = O(sqrt n) rows, computed
#   BEFORE any candidate pair materializes. At 100 TB this column is
#   what an operator can afford to compute over the full corpus (the
#   same pre-pair-bound discipline as the LSH bucket profile).
# - ``recall_at_k`` needs ground truth, so it scores candidates ONCE at
#   the maximum probe level, carries each candidate's cell rank, and
#   derives every level's top-k from that single pass (filter rn <= lvl
#   + one window) — never one scoring pass per level. Ground truth is
#   the brute-force top-k over the SAMPLED query set, which is exactly
#   how the curve is produced in production.
#
# tests/test_llm.py pins the internal consistency: the cheap cell-size
# count equals the materialized candidate count at every level.

_PROFILE_NPROBES = (1, 2, 4)

_PROFILE_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
cent AS (
  SELECT vec_id AS cid, v AS cv FROM e WHERE {cent_rule_sql()}
),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        list_dot_product(e.v, c.cv)
          / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))
        DESC, c.cid) AS rn
    FROM e, cent c
  ) WHERE rn = 1
),
cellsz AS (
  SELECT cid, COUNT(*) AS csz FROM asg GROUP BY cid
),
probe AS (
  SELECT qid, cid, rn FROM (
    SELECT q.vec_id AS qid, c.cid,
      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        list_dot_product(q.v, c.cv)
          / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.cv, c.cv)))
        DESC, c.cid) AS rn
    FROM e q, cent c WHERE q.vec_id < {_N_QUERIES}
  ) WHERE rn <= {max(_PROFILE_NPROBES)}
),
own AS (
  SELECT vec_id AS qid, cid AS own_cid FROM asg
  WHERE vec_id < {_N_QUERIES}
),
lv(lvl) AS (VALUES {", ".join(f"({p})" for p in _PROFILE_NPROBES)}),
counts AS (
  SELECT p.qid, l.lvl,
         SUM(s.csz)
           - MAX(CASE WHEN p.cid = o.own_cid THEN 1 ELSE 0 END)
           AS n_candidates
  FROM probe p
  JOIN cellsz s USING (cid)
  JOIN own o ON o.qid = p.qid
  CROSS JOIN lv l
  WHERE p.rn <= l.lvl
  GROUP BY p.qid, l.lvl
),
cand AS (
  SELECT p.qid, a.vec_id, p.rn
  FROM probe p JOIN asg a USING (cid)
  WHERE a.vec_id <> p.qid
),
scored AS (
  SELECT c.qid, c.vec_id, c.rn,
    list_dot_product(q.v, e.v)
      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))) AS cosine
  FROM cand c
  JOIN e q ON q.vec_id = c.qid
  JOIN e   ON e.vec_id = c.vec_id
),
topk AS (
  SELECT qid, vec_id, lvl FROM (
    SELECT s.qid, s.vec_id, l.lvl,
      ROW_NUMBER() OVER (PARTITION BY s.qid, l.lvl
                         ORDER BY s.cosine DESC, s.vec_id) AS rk
    FROM scored s CROSS JOIN lv l WHERE s.rn <= l.lvl
  ) WHERE rk <= {_TOP_K}
),
bf AS (SELECT qid, neighbor_id FROM ({_COSINE_ORACLE})),
hits AS (
  SELECT t.qid, t.lvl, COUNT(b.neighbor_id) AS n_hits
  FROM topk t
  LEFT JOIN bf b ON b.qid = t.qid AND b.neighbor_id = t.vec_id
  GROUP BY t.qid, t.lvl
)
SELECT c.qid,
       CAST(c.lvl AS BIGINT) AS nprobe,
       CAST(c.n_candidates AS BIGINT) AS n_candidates,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / {_TOP_K} AS recall_at_k
FROM counts c
LEFT JOIN hits h ON h.qid = c.qid AND h.lvl = c.lvl
ORDER BY c.qid, nprobe
"""


@query("emb_ivf_probe_profile", oracle=_PROFILE_ORACLE,
       tags=("llm", "similarity", "ivf", "diagnostics"))
def emb_ivf_probe_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(query, nprobe) candidate cost and recall@k — the operating
    curve read before changing a serving index's probe depth. Candidate
    counts come from cell sizes (pre-pair bound, O(sqrt n) rows); recall
    from ONE scored pass at the deepest level with each level's top-k
    derived by a rank filter."""
    (emb,) = load(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        norm_fold_expr("embedding", cast=True).alias("n"),
    )
    cent = ivf_centroids(base)
    asg = nearest_cells(base, cent, "vec_id", 1)
    cellsz = asg.groupBy("cid").agg(F.count(F.lit(1)).alias("csz"))
    queries = base.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("e").alias("qe"), F.col("n").alias("qn"),
    )
    max_p = max(_PROFILE_NPROBES)
    # ranked probe cells (nearest_cells drops the rank, which this
    # query needs to slice levels out of one pass)
    # bounded: sqrt(n) centroids — same bound as nearest_cells
    cscored = queries.crossJoin(F.broadcast(cent)).select(
        "qid", "qe", "qn", "cid",
        (dot_fold_expr("qe", "ce") / (F.col("qn") * F.col("cn"))).alias("ccos"),
    )
    wq = Window.partitionBy("qid").orderBy(F.col("ccos").desc(), F.col("cid"))
    probe = (
        cscored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= max_p)
        .select("qid", "qe", "qn", "cid", "rn")
    )
    # a query's ASSIGNED cell is its rank-1 probe cell by construction
    # (same scoring expression, same ccos-desc/cid-asc tie-break as the
    # corpus argmax), so derive it from the already-computed probe rows
    # instead of re-running a corpus-scale assignment job (r12 review)
    own = probe.filter(F.col("rn") == 1).select(
        "qid", F.col("cid").alias("own_cid")
    )
    lvl = F.explode(F.array(*[F.lit(p) for p in _PROFILE_NPROBES])).alias("lvl")
    counts = (
        # bounded: queries x nprobe probe cells / query-sized own-cell map
        cellsz.join(F.broadcast(probe.select("qid", "cid", "rn")), "cid")
        .join(F.broadcast(own), "qid")
        .select("qid", "cid", "rn", "csz", "own_cid", lvl)
        .filter(F.col("rn") <= F.col("lvl"))
        .groupBy("qid", "lvl")
        .agg(
            (F.sum("csz")
             - F.max(F.when(F.col("cid") == F.col("own_cid"), 1)
                     .otherwise(0))).alias("n_candidates")
        )
    )
    # one scored pass at the deepest level; every level slices it by rank
    # bounded: queries x nprobe probe cells
    cand = (
        asg.join(F.broadcast(probe), "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "vec_id", "rn",
            (dot_fold_expr("qe", "e")
             / (F.col("qn") * F.col("n"))).alias("cosine"),
        )
    )
    leveled = cand.select("qid", "vec_id", "rn", "cosine", lvl).filter(
        F.col("rn") <= F.col("lvl")
    )
    wk = Window.partitionBy("qid", "lvl").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    topk = (
        leveled.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= _TOP_K)
        .select("qid", "vec_id", "lvl")
    )
    bf = emb_cosine_topk(spark, sf_dir).select(
        "qid", F.col("neighbor_id").alias("vec_id"), F.lit(1).alias("hit")
    )
    hits = (
        topk.join(bf, ["qid", "vec_id"], "left")
        .groupBy("qid", "lvl")
        .agg(F.count("hit").alias("n_hits"))
    )
    return (
        counts.join(hits, ["qid", "lvl"], "left")
        .select(
            "qid",
            F.col("lvl").cast("long").alias("nprobe"),
            F.col("n_candidates").cast("long").alias("n_candidates"),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
             / _TOP_K).alias("recall_at_k"),
        )
        .orderBy("qid", "nprobe")
    )


# --- dominant singular direction (power iteration, unrolled) ------------------
# The linear-algebra primitive under PCA whitening / spectral embedding
# sanity checks: the top right-singular direction of the embedding
# matrix, by TWO unrolled power iterations of v -> X^T (X v) — the
# scalable formulation that never materializes the 64x64 Gram matrix:
# each half-step is one broadcast of the 64-entry direction + one
# partial-agg shuffle (per-vector dots, then per-dim sums), O(n * dims)
# per iteration. No driver loop, no collect.
#
# Exactness staging (the k-means 2^43 lesson applied): iteration-1 terms
# are RAW float32-derived values times small integers — short binary
# fractions whose decimal casts can tie — so they run in the exact
# integer domain (x * 2^43 times (1 + d), every term a whole number
# below 2^55, decimal(38,0) sums). From iteration 2 on, every factor is
# a generic full-precision double (tie probability ~2^-40), so the
# proven decimal product-sum idiom applies; magnitudes are staged so no
# decimal overflows, and the final normalization (max-scale, then unit
# norm, then sign-fix on dim 0) cancels every carried scale factor.

_POW_SCALE = float(1 << 43)

_TOP_SINGULAR_ORACLE = f"""
WITH pts AS (
  SELECT vec_id, t.d AS d, v[t.d + 1] AS x
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       (SELECT UNNEST(range(0, {_DIMS})) AS d) t
),
s1 AS (  -- X v0 with v0_d = 1 + d, exact integer domain
  SELECT vec_id,
         CAST(SUM(CAST((x * {_POW_SCALE!r}) * (1 + d) AS DECIMAL(38,0))) AS DOUBLE)
           / {_POW_SCALE!r} AS s
  FROM pts GROUP BY vec_id
),
y1 AS (  -- X^T s1
  SELECT d, CAST(SUM(CAST(p.x * s1.s AS DECIMAL(28,9))) AS DOUBLE) AS y
  FROM pts p JOIN s1 USING (vec_id) GROUP BY d
),
s2 AS (  -- X y1
  SELECT vec_id,
         CAST(SUM(CAST(p.x * y1.y AS DECIMAL(38,9))) AS DOUBLE) AS s
  FROM pts p JOIN y1 USING (d) GROUP BY vec_id
),
y2 AS (  -- X^T s2
  SELECT d, CAST(SUM(CAST(p.x * s2.s AS DECIMAL(38,9))) AS DOUBLE) AS y
  FROM pts p JOIN s2 USING (vec_id) GROUP BY d
),
mx AS (SELECT MAX(ABS(y)) AS m FROM y2),
u AS (SELECT d, y / (SELECT m FROM mx) AS u FROM y2),
nrm AS (
  SELECT sqrt(CAST(SUM(CAST(u * u AS DECIMAL(28,9))) AS DOUBLE)) AS nr,
         MAX(CASE WHEN d = 0 THEN u END) AS u0
  FROM u
)
SELECT d, ROUND(u.u / n.nr * (CASE WHEN n.u0 < 0 THEN -1 ELSE 1 END), 9) AS loading
FROM u, nrm n
"""


@query("emb_top_singular_direction", oracle=_TOP_SINGULAR_ORACLE,
       tags=("llm", "similarity", "linalg", "pca"))
def emb_top_singular_direction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top right-singular direction of the embedding matrix via two
    unrolled v -> X^T(Xv) power iterations — broadcast direction, two
    partial-agg shuffles per iteration, Gram matrix never materialized;
    unit-normalized with a deterministic sign (dim-0 positive)."""
    (emb,) = load(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("d", "x"),
    )
    s1 = pts.groupBy("vec_id").agg(
        (
            F.sum(((F.col("x") * _POW_SCALE) * (1 + F.col("d")))
                  .cast("decimal(38,0)")).cast("double") / _POW_SCALE
        ).alias("s")
    )
    y1 = (
        # bounded: d-row power-iteration vector
        pts.join(F.broadcast(s1), "vec_id")
        .groupBy("d")
        .agg(F.sum((F.col("x") * F.col("s")).cast("decimal(28,9)"))
             .cast("double").alias("y"))
    )
    s2 = (
        pts.join(F.broadcast(y1), "d")
        .groupBy("vec_id")
        .agg(F.sum((F.col("x") * F.col("y")).cast("decimal(38,9)"))
             .cast("double").alias("s"))
    )
    y2 = (
        # bounded: d-row power-iteration vector
        pts.join(F.broadcast(s2), "vec_id")
        .groupBy("d")
        .agg(F.sum((F.col("x") * F.col("s")).cast("decimal(38,9)"))
             .cast("double").alias("y"))
    )
    mx = y2.agg(F.max(F.abs("y")).alias("m"))
    u = y2.crossJoin(F.broadcast(mx)).select(
        "d", (F.col("y") / F.col("m")).alias("u")
    )
    nrm = u.agg(
        F.sqrt(
            F.sum((F.col("u") * F.col("u")).cast("decimal(28,9)"))
            .cast("double")
        ).alias("nr"),
        F.max(F.when(F.col("d") == 0, F.col("u"))).alias("u0"),
    )
    # bounded: 1-row norm
    return u.crossJoin(F.broadcast(nrm)).select(
        "d",
        F.round(
            F.col("u") / F.col("nr")
            * F.when(F.col("u0") < 0, -1.0).otherwise(1.0),
            9,
        ).alias("loading"),
    )


# --- Johnson-Lindenstrauss random projection (dim reduction) ------------------
# The cheapest scale lever on an embedding corpus: project d=64 -> k=16
# with a deterministic +-1 matrix (Achlioptas' database-friendly JL
# variant — signs from a counter hash, no RNG, so runs reproduce across
# engines and sessions; the 1/sqrt(k) scale cancels in cosine).  At
# 100 TB this is a single narrow map over the vectors — no shuffle, no
# state — that cuts every downstream distance computation and shuffle
# byte count 4x; the recall@k diagnostic against the exact full-space
# top-k is the dial that says what that 4x costs in quality (JL lemma:
# distortion ~ sqrt(ln n / k)).  Projection is the same fold shape as
# the LSH signatures (one parsed expression, plane matrix inline), so
# the projected coordinates are bit-identical to the oracle's
# list_dot_product and the ranking arithmetic hash-checks exactly.

_RP_DIMS = 16


def _rp_sign(j: int, d: int) -> int:
    """Deterministic +-1 entry of the projection matrix (shared
    counter-hash, namespaced apart from the LSH plane signs)."""
    return _counter_sign(f"rp_{j}_{d}")


def _rp_proj_expr(dims: int) -> F.Column:
    """``array<double>`` of the _RP_DIMS projected coordinates of ``e``:
    one sequential fold per output dim, matrix as an inline literal
    (parses in ms; evaluates per VECTOR, not per pair)."""
    rows = ", ".join(
        "array(" + ", ".join(
            f"{float(_rp_sign(j, d))}D" for d in range(dims)
        ) + ")"
        for j in range(_RP_DIMS)
    )
    return F.expr(
        f"""
        transform(sequence(0, {_RP_DIMS - 1}), j ->
          aggregate(
            zip_with(e, element_at(array({rows}), j + 1), (x, w) -> x * w),
            0.0D, (a, x) -> a + x))
        """
    )


def _jl_oracle() -> str:
    rows = ", ".join(
        "({j}, [{w}]::DOUBLE[])".format(
            j=j,
            w=", ".join(f"{float(_rp_sign(j, d))}" for d in range(_DIMS)),
        )
        for j in range(_RP_DIMS)
    )
    return f"""
WITH c AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
),
rp(j, w) AS (VALUES {rows}),
proj AS (
  SELECT vec_id, list(list_dot_product(e, w) ORDER BY j) AS p
  FROM c, rp GROUP BY vec_id
),
s AS (
  SELECT q.vec_id AS qid, v.vec_id,
         list_dot_product(q.p, v.p)
           / (sqrt(list_dot_product(q.p, q.p)) * sqrt(list_dot_product(v.p, v.p)))
           AS pcos
  FROM proj q, proj v
  WHERE q.vec_id < {_N_QUERIES} AND v.vec_id <> q.vec_id
),
pr AS (
  SELECT qid, vec_id AS neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY pcos DESC, vec_id) AS rank
    FROM s
  ) WHERE rank <= {_TOP_K}
),
bf AS (SELECT qid, neighbor_id FROM ({_COSINE_ORACLE}))
SELECT b.qid,
       CAST(COUNT(p.neighbor_id) AS BIGINT) AS n_hits,
       CAST({_TOP_K} AS BIGINT) AS k,
       CAST(COUNT(p.neighbor_id) AS DOUBLE) / {_TOP_K} AS recall_at_k
FROM bf b
LEFT JOIN pr p ON p.qid = b.qid AND p.neighbor_id = b.neighbor_id
GROUP BY b.qid
"""


@query("emb_jl_projection_recall", oracle=_jl_oracle(),
       tags=("llm", "similarity", "projection", "diagnostics"))
def emb_jl_projection_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of brute-force top-k run in JL-projected 16-dim space vs
    the exact 64-dim top-k.  The projected vectors and both rankings are
    hash-checked end-to-end (projection folds == list_dot_product, same
    quotient arithmetic as emb_cosine_topk, vec_id tie-break), so the
    driver verifies the dimensionality-reduction arithmetic itself, not
    just row counts."""
    (emb,) = load(spark, sf_dir, "embeddings")
    proj = (
        emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )
        .select("vec_id", _rp_proj_expr(_DIMS).alias("p"))
        .withColumn("pn", norm_fold_expr("p"))
    )
    q = proj.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("p").alias("qp"),
        F.col("pn").alias("qpn"),
    )
    scored = (
        # bounded: fixed query set
        proj.crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("vec_id"))
        .select(
            "qid", "vec_id",
            (dot_fold_expr("qp", "p") / (F.col("qpn") * F.col("pn")))
            .alias("pcos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("pcos").desc(), F.col("vec_id"))
    pr = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("qid", F.col("vec_id").alias("neighbor_id"), F.lit(1).alias("hit"))
    )
    bf = emb_cosine_topk(spark, sf_dir).select("qid", "neighbor_id")
    return (
        bf.join(pr, ["qid", "neighbor_id"], "left")
        .groupBy("qid")
        .agg(
            F.count("hit").alias("n_hits"),
            F.lit(_TOP_K).cast("long").alias("k"),
            (F.count("hit").cast("double") / _TOP_K).alias("recall_at_k"),
        )
    )


# --- MMR diversity re-ranking (r9) ---------------------------------------------
# Maximal Marginal Relevance (Carbonell & Goldstein '98): re-rank a
# retrieval shortlist so each pick balances relevance against redundancy
# with what is already selected —
#   pick_i = argmax_d  lam*rel(q,d) - (1-lam)*max_{s in selected} sim(d,s)
# The standard diversity stage between ANN retrieval and an LLM context
# window. Scale shape: everything happens INSIDE the per-query shortlist
# (top-N candidates from the cosine ranking) — pairwise sims are
# O(|Q| * N^2), the greedy loop is k UNROLLED DataFrame steps (k, N
# constants; build stays lazy, no driver data) — the same
# bounded-per-basket argument as market-basket pairs. Determinism: rel
# and sim use the exact fold/divide structure the other cosine queries
# hash-match on, so scores are bit-identical and the per-step argmax
# (score DESC, vec_id) picks the same document on both engines.

_MMR_LAMBDA = 0.7
_MMR_N_CAND = 12
_MMR_K = 5


def _mmr_oracle(cand_ctes: str | None = None) -> str:
    """The MMR greedy unroll in DuckDB SQL. ``cand_ctes`` overrides the
    candidate-pool CTE chain (must end in a CTE named ``cand`` with
    columns (qid, vec_id, rel)); the default pool is the brute-force
    top-N relevance cut — emb_mmr_rerank_ann (queries/llm_extra.py)
    passes the exact-reranked IVF-PQ shortlist instead, making the
    relevance pass O(shortlist) rather than O(corpus)."""
    steps = []
    prev = "sel1"
    for i in range(2, _MMR_K + 1):
        steps.append(f"""
sel{i} AS (
  SELECT qid, vec_id, rel, score, {i} AS step FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY score DESC, vec_id) AS rn
    FROM (
      SELECT d.qid, d.vec_id, d.rel,
             {_MMR_LAMBDA}*d.rel - {1 - _MMR_LAMBDA:.1f}*MAX(p.sim) AS score
      FROM cand d
      JOIN ps p ON p.qid = d.qid AND p.av = d.vec_id
      JOIN {prev} s ON s.qid = p.qid AND s.vec_id = p.bv
      WHERE NOT EXISTS (SELECT 1 FROM {prev} s2
                        WHERE s2.qid = d.qid AND s2.vec_id = d.vec_id)
      GROUP BY d.qid, d.vec_id, d.rel
    )
  ) WHERE rn = 1
),
sel{i}u AS (
  SELECT qid, vec_id, rel, score, step FROM {prev}
  UNION ALL SELECT qid, vec_id, rel, score, step FROM sel{i}
)""")
        prev = f"sel{i}u"
    if cand_ctes is None:
        cand_ctes = f"""rel AS (
  SELECT qid, vec_id,
         list_dot_product(qe, e)
           / (sqrt(list_dot_product(qe, qe))
              * sqrt(list_dot_product(e, e))) AS rel
  FROM q, c WHERE qid <> vec_id
),
cand AS (
  SELECT qid, vec_id, rel FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY rel DESC, vec_id) AS rn
    FROM rel
  ) WHERE rn <= {_MMR_N_CAND}
)"""
    return f"""
WITH q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
  FROM embeddings WHERE vec_id < {_N_QUERIES}
),
c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
{cand_ctes},
ps AS (
  SELECT a.qid, a.vec_id AS av, b.vec_id AS bv,
         list_dot_product(ca.e, cb.e)
           / (sqrt(list_dot_product(ca.e, ca.e))
              * sqrt(list_dot_product(cb.e, cb.e))) AS sim
  FROM cand a
  JOIN cand b ON b.qid = a.qid AND b.vec_id <> a.vec_id
  JOIN c ca ON ca.vec_id = a.vec_id
  JOIN c cb ON cb.vec_id = b.vec_id
),
sel1 AS (
  SELECT qid, vec_id, rel, {_MMR_LAMBDA}*rel AS score, 1 AS step FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY rel DESC, vec_id) AS rn
    FROM cand
  ) WHERE rn = 1
),{",".join(steps)}
SELECT qid, vec_id AS neighbor_id, step, ROUND(score, 9) AS mmr_score
FROM {prev}
ORDER BY qid, step
"""


def mmr_greedy(cand: DataFrame, lam: float = _MMR_LAMBDA,
               k: int = _MMR_K) -> DataFrame:
    """The MMR greedy selection unrolled to ``k`` declarative steps over
    a candidate pool ``cand`` with columns (qid, vec_id, e, n, rel).
    Shared by the brute-force twin (emb_mmr_rerank — the exact-oracle
    baseline) and the serving composition over the ANN shortlist
    (emb_mmr_rerank_ann, queries/llm_extra.py). Pairwise similarity is
    computed over the pool only (O(pool^2) per query, pool = 12), so
    the caller controls the corpus-facing cost through the pool."""
    a = cand.select("qid", F.col("vec_id").alias("av"),
                    F.col("e").alias("ea"), F.col("n").alias("na"))
    b = cand.select(F.col("qid").alias("qid_b"),
                    F.col("vec_id").alias("bv"),
                    F.col("e").alias("eb"), F.col("n").alias("nb"))
    ps = (
        a.join(b, (F.col("qid") == F.col("qid_b"))
               & (F.col("av") != F.col("bv")))
        .select(
            "qid", "av", "bv",
            (dot_fold_expr("ea", "eb") / (F.col("na") * F.col("nb")))
            .alias("sim"),
        )
    )
    # LINEAR-depth greedy: collapse each qid's pool to ONE row (candidate
    # array + pairwise-sim array) and compute the k picks as chained
    # per-row HOF folds. The earlier join/union unroll embedded the pool
    # subtree ~2^k times in the logical plan — Catalyst ANALYSIS (not
    # execution) took tens of seconds per build at any SF. Here each step
    # is one Project over the previous one. Float parity with the oracle
    # holds because every operation is the same arithmetic in the same
    # order: argmax folds use strict (score, vec_id) comparisons (the
    # window's score DESC, vec_id ASC), MAX over sims is
    # order-independent, and the score expression's literals print
    # identically on both sides.
    lam_s, mu_s = f"{lam}D", f"{1 - lam:.1f}D"
    pooled = cand.groupBy("qid").agg(
        F.collect_list(F.struct("vec_id", "rel")).alias("cand_arr"))
    paired = ps.groupBy("qid").agg(
        F.collect_list(F.struct("av", "bv", "sim")).alias("pair_arr"))
    df = pooled.join(paired, "qid", "left").select(
        "qid", "cand_arr",
        F.coalesce(
            "pair_arr",
            F.expr("CAST(array() AS ARRAY<STRUCT<av: BIGINT, bv: BIGINT,"
                   " sim: DOUBLE>>)"),
        ).alias("pair_arr"),
    )

    def argmax(arr_sql: str) -> str:
        # fold replicating ROW_NUMBER() OVER (ORDER BY score DESC, vec_id)
        return (
            f"aggregate({arr_sql}, CAST(NULL AS STRUCT<vec_id: BIGINT,"
            " rel: DOUBLE, score: DOUBLE>), (b, x) -> IF(b IS NULL"
            " OR x.score > b.score OR (x.score = b.score AND"
            " x.vec_id < b.vec_id), x, b))"
        )

    df = df.withColumn("s1", F.expr(argmax(
        f"transform(cand_arr, c -> struct(c.vec_id AS vec_id,"
        f" c.rel AS rel, {lam_s} * c.rel AS score))")))
    df = df.withColumn("chosen1", F.expr("array(s1.vec_id)"))
    for i in range(2, k + 1):
        prev = f"chosen{i - 1}"
        # remaining candidates scored lam*rel - (1-lam)*MAX(sim to chosen);
        # a candidate with no pair to any chosen is dropped (the oracle's
        # inner join) — impossible for a complete pool graph, guarded
        # anyway by the score IS NOT NULL filter.
        scored = (
            f"filter(transform(filter(cand_arr,"
            f" c -> NOT array_contains({prev}, c.vec_id)),"
            f" c -> struct(c.vec_id AS vec_id, c.rel AS rel,"
            f" {lam_s} * c.rel - {mu_s} * aggregate("
            f"filter(pair_arr, p -> p.av = c.vec_id"
            f" AND array_contains({prev}, p.bv)),"
            f" CAST(NULL AS DOUBLE),"
            f" (m, p) -> IF(m IS NULL OR p.sim > m, p.sim, m)) AS score)),"
            f" x -> x.score IS NOT NULL)"
        )
        df = df.withColumn(f"s{i}", F.expr(argmax(scored)))
        df = df.withColumn(f"chosen{i}", F.expr(
            f"IF(s{i} IS NULL, {prev}, array_append({prev}, s{i}.vec_id))"))
    steps_arr = ", ".join(
        f"struct(s{i}.vec_id AS neighbor_id, {i} AS step,"
        f" round(s{i}.score, 9) AS mmr_score)"
        for i in range(1, k + 1)
    )
    out = df.select("qid", F.explode(F.expr(
        f"filter(array({steps_arr}), x -> x.neighbor_id IS NOT NULL)"
    )).alias("s"))
    return out.select("qid", "s.neighbor_id", "s.step",
                      "s.mmr_score").orderBy("qid", "step")


@query("emb_mmr_rerank", oracle=_mmr_oracle(),
       tags=("llm", "similarity", "retrieval", "mmr"))
def emb_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity re-rank over the brute-force relevance pool — the
    exact-oracle BASELINE twin: the corpus x queries relevance pass is
    what makes the DuckDB mirror exact. The serving shape at scale is
    emb_mmr_rerank_ann (queries/llm_extra.py), which feeds the same
    greedy unroll from the IVF-PQ shortlist so relevance costs
    O(shortlist), not O(corpus)."""
    (emb,) = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qe"),
        norm_fold_expr("embedding", cast=True).alias("qn"),
    )
    c = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        norm_fold_expr("embedding", cast=True).alias("n"),
    )
    rel = (
        # bounded: fixed query set
        c.crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("vec_id"))
        .select(
            "qid", "vec_id", "e", "n",
            (dot_fold_expr("qe", "e") / (F.col("qn") * F.col("n")))
            .alias("rel"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("rel").desc(), "vec_id")
    cand = (
        rel.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _MMR_N_CAND)
        .drop("rn")
    )
    return mmr_greedy(cand)
