"""Query registry — the driver-facing surface.

Every operator from SURVEY.md §2 is exposed as a named query:
``fn(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a DuckDB
oracle SQL string over the same parquet tables. ``__spark_entry__.py``
re-exports this registry.

Oracle-parity discipline (see SURVEY.md §5.2): driver hashes values, so
results must be *bit-identical* to DuckDB's:

- money/measure sums: SUM(CAST(x AS DECIMAL(18,4))) then CAST AS DOUBLE —
  decimal summation is exact, so the final double is deterministic on both
  engines regardless of partitioning / aggregation order;
- averages: exact decimal sum divided by count, both as doubles;
- never emit raw ns timestamps: emit int64 epoch-ns (oracle: epoch_ns(ts))
  or truncated/formatted strings;
- every computed column aliased identically on both sides;
- any per-group "pick one row" uses an explicit total order (window +
  row_number with unique tiebreaker), never dropDuplicates' arbitrary row.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QueryDef"] = {}

# Modules that define queries; imported lazily by all_queries().
_MODULES = (
    "cdc_state",
    "llm_dedup",
    "llm_similarity",
    "windows",
    "setops",
    "events_json",
    "collections",
    "udfs",
    "reshape",
    "llm_extra",
    "timeseries",
    "sqlfns",
    "sketches",
    "funnels",
    "scd",
    "ivm_views",
    "llm_text",
    "multimodal",
    "profiling",
    "relational",
    "tpch_extra",
    "tpch_rest",
    "joins",
    "subqueries",
    "aggregates",
)

# Registry iteration order matters operationally: the driver's CORRECTNESS
# run samples the first 50 queries in iteration order.  DISCIPLINE (r7
# verdict): rotating this list is part of ADDING any registry query —
# every name that has never earned a driver-side green CORRECTNESS row
# goes first, composition-verifying queries in front; remaining slots
# carry the STALEST previously-green names (r8 verdict item 3) so the
# cumulative driver evidence keeps refreshing.  As of round 9 every
# oracle-backed name has been driver-sampled green at least once.  The
# round-10 list fronts the 4 r10 additions, then the ENTIRE dedup +
# embedding/ANN family (all of those plans changed in r10 — trigram
# shingles, r=4 banding, adaptive quantizer), then the stalest
# r3-sampled names; the driver samples the first 50 (the two names
# past slot 50 rotate in next round).
# all_queries() yields these first, then every other query in
# registration order.  Do NOT reorder mid-round.
_PRIORITY = (
    # round-10 additions first
    "cdc_publication_filter_state",
    "emb_mmr_rerank_ann",
    "docs_bpe_train_merges",
    "docs_bpe_encode_stats",
    "docs_filter_funnel",
    # the entire dedup + embedding/ANN family: round 10 re-parameterized
    # the MinHash shingles/banding (trigram, r=4) and made the IVF/PQ
    # quantizer rules adaptive — every one of these plans changed, so
    # they take the driver slots this round for fresh post-change rows
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_verified_pairs",
    "dedup_cc_clusters",
    "dedup_keep_best",
    "dedup_minhash_estimate",
    "dedup_containment",
    "dedup_incremental_new_docs",
    "dedup_dup_ngram_spans",
    "dedup_simhash",
    "dedup_simhash_hamming",
    "dedup_ngram_jaccard",
    "dedup_fuzzy_levenshtein",
    "dedup_embedding_cosine",
    "dedup_by_key_latest",
    "emb_cosine_topk",
    "emb_lsh_ann_topk",
    "emb_ivf_ann_topk",
    "emb_semantic_dedup",
    "emb_kmeans_lloyd",
    "emb_ivf_recall_at_k",
    "emb_ivf_pq_topk",
    "emb_pq_adc_topk",
    "emb_ann_rerank_exact",
    "emb_mmr_rerank",
    "emb_ann_index_probe",
    "emb_ann_index_filtered_probe",
    "emb_ann_index_incremental",
    "emb_ann_index_filtered_incremental",
    "emb_ann_index_compacted",
    "emb_ann_index_stats",
    "emb_ann_index_idmap_stats",
    "emb_ann_index_asof_probe",
    "emb_jl_projection_recall",
    "emb_quantize_int8",
    "emb_norm_stats",
    "emb_top_singular_direction",
    "hybrid_rrf_retrieval",
    "training_mix_pipeline",
    # stalest oracle-backed names (last driver-sampled r3) fill the
    # remaining sample slots; the two declared-approximate no-oracle
    # names stay excluded (pytest bounds them instead)
    "q9_profit_by_nation",
    "scalar_date_fns",
    "scalar_decimal_arith",
    "scalar_math_fns",
    "scalar_string_fns",
    "subq_exists_late_orders",
    "subq_in_big_qty_orders",
    "subq_scalar_correlated",
    "subq_scalar_global",
)


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None -> driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def _load_all() -> None:
    for m in _MODULES:
        try:
            importlib.import_module(f"{__name__}.{m}")
        except ModuleNotFoundError as e:
            # Module not written yet (incremental build); only swallow our own.
            if f"{__name__}.{m}" not in str(e):
                raise


def all_queries() -> dict[str, QueryDef]:
    _load_all()
    ordered: dict[str, QueryDef] = {}
    for name in _PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, qd in REGISTRY.items():
        if name not in ordered:
            ordered[name] = qd
    return ordered
