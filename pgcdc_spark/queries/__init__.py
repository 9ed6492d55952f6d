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
# Round-12 list (VERDICT r11 item 3): the ELEVEN names that overflowed
# the r11 sample (events_locf_fill onward in the r11 list, last sampled
# round 5) go first, then the next-stalest cohorts by last-sampled
# round: r6 (4 names), r7 (30 names), then the alphabetical head of the
# r8 cohort to fill slot 50.  New round-12 queries, if any, are
# prepended above the overflow block when added.  The two
# declared-approximate no-oracle names (agg_approx_distinct,
# sketch_hll_distinct) stay excluded: pytest bounds them instead, and a
# rows-only driver row would spend a full-oracle slot.
# all_queries() yields these first, then every other query in
# registration order.  Do NOT reorder mid-round.
_PRIORITY = (
    # round-12 addition (never driver-sampled) — first
    "emb_ivf_probe_profile",
    # r11 sample overflow (last sampled round 5) — next per VERDICT
    "events_locf_fill",
    "events_ohlc_hourly",
    "events_variant_extract",
    "join_asof_tolerance",
    "mm_binary_meta",
    "mm_frame_sample",
    "mm_resize",
    "scalar_posexplode_ordinal",
    "scalar_try_arith",
    "subq_lateral_topn",
    "udf_pandas_grouped_agg",
    # last sampled round 6
    "events_from_json_agg",
    "events_json_extract",
    "setop_except_all",
    "setop_intersect_all",
    # last sampled round 7
    "cdc_changelog_stats",
    "cdc_debezium_state",
    "cdc_evolving_state",
    "cdc_mongo_patch_state",
    "cdc_mongo_state",
    "cdc_widening_state",
    "distinct_rows",
    "docs_weighted_sample",
    "dq_expectations_orders",
    "graph_bfs_hops",
    "ivm_agg_view_state",
    "ivm_join_view_state",
    "ivm_minmax_view_state",
    "merge_into_customer_orders",
    "mm_audio_resample",
    "mm_extract_features",
    "profile_orders_columns",
    "setop_except",
    "setop_intersect",
    "setop_union_by_name",
    "setop_union_distinct",
    "sort_limit_topn",
    "udf_sql_registered",
    "window_lag_lead",
    "window_ntile",
    "window_range_between",
    "window_rank_distributions",
    "window_running_frames",
    "window_sessionize",
    "window_topk_per_group",
    # last sampled round 8 (alphabetical head; names past slot 50
    # overflow to round 13 and rotate to the front there)
    "agg_abc_pareto",
    "agg_linreg_by_type",
    "agg_rfm_segmentation",
    "agg_weighted_median",
    "assoc_rules_copurchase",
    "cdc_lsn_gap_audit",
    "cdc_multitable_route_state",
    "cdc_pgoutput_state",
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
