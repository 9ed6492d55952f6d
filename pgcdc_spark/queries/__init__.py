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
    "entity_resolution",
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
# oracle-backed name has been driver-sampled green at least once.
# Round-13 list (VERDICT r12 item 4): the four new round-13 queries
# first (never driver-sampled), then the THIRTY-FOUR r8-cohort names
# that overflowed the r12 sample (r12 took the alphabetical head
# agg_abc_pareto..cdc_pgoutput_state; the rest, last sampled round 8,
# rotate to the front here), then the alphabetical head of the r9
# cohort (49 names) to fill slot 50 — names past slot 50 overflow to
# round 14 and rotate to the front there.  The two declared-approximate
# no-oracle names (agg_approx_distinct, sketch_hll_distinct) stay
# excluded: pytest bounds them instead, and a rows-only driver row
# would spend a full-oracle slot.
# all_queries() yields these first, then every other query in
# registration order.  Do NOT reorder mid-round.
_PRIORITY = (
    # round-13 additions (never driver-sampled) — first
    "cdc_wal2json_v2_state",
    "cdc_wal2json_v2_keyroute_state",
    "docs_line_dedup",
    "emb_triplet_mining",
    # r12 sample overflow (last sampled round 8) — next per VERDICT
    "assoc_rules_copurchase",
    "cdc_lsn_gap_audit",
    "cdc_multitable_route_state",
    "cdc_pgoutput_state",
    "cdc_pgoutput_stream_state",
    "cdc_snapshot_cutover_state",
    "cdc_time_travel_state",
    "cdc_toast_upsert_state",
    "cdc_upsert_state",
    "cdc_wal2json_state",
    "docs_bm25_topk",
    "docs_cms_heavy_hitters",
    "docs_mixture_weights",
    "docs_phrase_search",
    "docs_train_val_test_split",
    "events_ewma_smooth",
    "events_markov_transitions",
    "events_outliers_mad",
    "events_outliers_zscore",
    "events_session_window_native",
    "feat_target_encoding",
    "graph_bfs_recursive_cte",
    "graph_pagerank",
    "graph_triangle_count",
    "ivm_bm25_topk_state",
    "ivm_distinct_view_state",
    "ivm_histogram_view_state",
    "ivm_term_df_state",
    "ivm_topk_view_state",
    "mm_binary_ingest",
    "mm_quarantine_deadletter",
    "profile_drift_psi",
    "profile_join_key_skew",
    "scalar_collation_groupby",
    # last sampled round 9 (alphabetical head; the rest overflow to r14)
    "agg_collect_set",
    "agg_cube",
    "agg_distinct_stats",
    "agg_filtered_pivot",
    "agg_global",
    "agg_percentiles",
    "agg_rollup",
    "agg_stddev_stable",
    "case_when_coalesce",
    "cdc_e2e_revenue_rollup",
    "cdc_message_audit",
    "cdc_origin_filter_state",
    # (cdc_replica_identity_state, cdc_two_phase_state,
    # cdc_xlog_infer_state — next in the r9 cohort — overflow to r14:
    # the four r13 additions take their slots plus one more)
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
