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
# run samples the first 50 queries in iteration order.  Rounds 1-4
# cumulatively greenlit 100/149 names; the 49 below have never earned a
# driver-side oracle row (they pass the independent sweep,
# scripts/parity_sweep.py).  all_queries() yields these first — plus the
# round-5 addition join_asof_tolerance, making exactly 50 — then every
# already-driver-green query in registration order.
# ROUND-6 NOTE: once CORRECTNESS_r05 lands green rows for the first 50,
# replace _PRIORITY with whatever names remain un-sampled. As of end of
# round 5 that is exactly the slots past the 50-boundary below:
#   mm_audio_resample, merge_into_customer_orders, profile_orders_columns,
#   dq_expectations_orders, graph_bfs_hops, udf_sql_registered,
#   cdc_widening_state, docs_weighted_sample
# plus anything round 6 adds. Do NOT reorder mid-round.
_PRIORITY = (
    # llm_extra (8)
    "emb_pq_adc_topk",
    "dedup_incremental_new_docs",
    "dedup_dup_ngram_spans",
    "dedup_containment",
    "emb_ivf_pq_topk",
    "dedup_simhash_hamming",
    "dedup_keep_best",
    "dedup_minhash_estimate",
    # timeseries (3)
    "events_locf_fill",
    "events_linear_interp",
    "events_ohlc_hourly",
    # sqlfns (8)
    "agg_median_mode",
    "agg_histogram_width_bucket",
    "scalar_try_arith",
    "agg_string_agg_ordered",
    "scalar_posexplode_ordinal",
    "events_variant_extract",
    "udf_pandas_grouped_agg",
    "agg_boolean_predicates",
    # sketches (2)
    "agg_bitmap_distinct",
    "sketch_hll_distinct",
    # funnels (2)
    "events_funnel_conversion",
    "events_cohort_retention",
    # scd (2)
    "cdc_scd2_history",
    "cdc_scd2_point_in_time",
    # llm_text (17)
    "docs_token_stats",
    "docs_lang_profile",
    "docs_lang_id",
    "docs_quality_score",
    "docs_fingerprint",
    "docs_tfidf",
    "docs_hash_sample",
    "docs_chunk_windows",
    "docs_repetition",
    "docs_redact",
    "corpus_prep_pipeline",
    "docs_top_bigrams",
    "docs_stratified_sample",
    "docs_token_bpe_regex",
    "docs_unigram_logprob",
    "docs_decontam_overlap",
    "docs_pack_sequences",
    # multimodal (4)
    "mm_binary_meta",
    "mm_extract_features",
    "mm_resize",
    "mm_frame_sample",
    # stragglers from otherwise-green modules (3)
    "subq_lateral_topn",
    "agg_grouping_sets",
    "agg_corr_covar",
    # round-5 new surface (1) — total 50
    "join_asof_tolerance",
    # just past the 50-sample boundary; rotate in next round
    "mm_audio_resample",
    "merge_into_customer_orders",
    "profile_orders_columns",
    "dq_expectations_orders",
    "graph_bfs_hops",
    "udf_sql_registered",
    "cdc_widening_state",
    "docs_weighted_sample",
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
