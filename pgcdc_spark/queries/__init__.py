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
# goes first, composition-verifying queries in front.  Rounds 1-7
# cumulatively greenlit 163/178 oracle-backed names; the list below is
# the 15 round-7 additions (never driver-sampled; all pass
# scripts/parity_sweep.py at sf0.1) plus the round-8 additions.
# all_queries() yields these first, then every already-driver-green
# query in registration order.  Do NOT reorder mid-round.
_PRIORITY = (
    # round-8 new surface
    "cdc_pgoutput_stream_state",
    "cdc_multitable_route_state",
    "cdc_toast_upsert_state",
    "profile_drift_psi",
    "cdc_lsn_gap_audit",
    "events_ewma_smooth",
    "agg_linreg_by_type",
    "assoc_rules_copurchase",
    "agg_abc_pareto",
    "feat_target_encoding",
    "agg_rfm_segmentation",
    "profile_join_key_skew",
    "cdc_wal2json_state",
    "cdc_pgoutput_state",
    "emb_ann_index_asof_probe",
    "scalar_collation_groupby",
    "cdc_time_travel_state",
    "events_session_window_native",
    "graph_bfs_recursive_cte",
    "cdc_snapshot_cutover_state",
    "emb_jl_projection_recall",
    "ivm_histogram_view_state",
    "emb_ann_rerank_exact",
    "emb_ann_index_filtered_probe",
    "mm_binary_ingest",
    "docs_mixture_weights",
    "docs_train_val_test_split",
    "emb_ann_index_idmap_stats",
    "ivm_topk_view_state",
    "emb_ann_index_filtered_incremental",
    "emb_lsh_ann_topk",  # rows-only -> full oracle in r8: re-hash-check
    "ivm_term_df_state",
    "ivm_bm25_topk_state",
    "hybrid_rrf_retrieval",
    # round-7, composition-verifying first
    "training_mix_pipeline",
    "emb_ann_index_incremental",
    "ivm_distinct_view_state",
    # round-7, the rest
    "agg_weighted_median",
    "docs_bm25_topk",
    "docs_cms_heavy_hitters",
    "docs_phrase_search",
    "emb_ann_index_compacted",
    "emb_ann_index_stats",
    "events_markov_transitions",
    "events_outliers_mad",
    "events_outliers_zscore",
    "graph_pagerank",
    "graph_triangle_count",
    "mm_quarantine_deadletter",
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
