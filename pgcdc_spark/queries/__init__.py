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
# oracle-backed name has been driver-sampled green at least once.  The
# round-11 list fronts the five r11 additions (ER pair/golden queries,
# the z-order layout-cell query, weighted priority sampling, the LSH
# operating-point monitor — all never driver-sampled), then the
# stale-cohort rotation VERDICT r10
# item 5 asked for: all 56 oracle-backed names last driver-sampled in
# rounds 3-5, oldest round first, alphabetical within a round.  The
# driver samples the first 50, so the LAST ELEVEN names below
# (events_locf_fill onward) overflow this round's sample and rotate
# to the front of the round-12 list.  The two
# declared-approximate no-oracle names (agg_approx_distinct,
# sketch_hll_distinct) stay excluded: pytest bounds them instead, and a
# rows-only driver row would spend a full-oracle slot.
# all_queries() yields these first, then every other query in
# registration order.  Do NOT reorder mid-round.
_PRIORITY = (
    # round-11 additions first
    "er_candidate_pairs",
    "er_golden_records",
    "layout_zorder_key_stats",
    "docs_priority_sample_strata",
    "dedup_lsh_bucket_profile",
    # last sampled round 3
    "subq_in_big_qty_orders",
    "subq_scalar_correlated",
    "subq_scalar_global",
    # last sampled round 4
    "events_gapfill_spine",
    "events_hourly_rollup",
    "events_json_tuple",
    "events_window_sliding",
    "events_window_tumbling",
    "pivot_status_counts",
    "scalar_array_fns",
    "scalar_array_lambdas",
    "scalar_map_fns",
    "udf_grouped_map_center",
    "udf_pandas_scalar",
    "udf_udtf_tokenize",
    "unpivot_measures",
    # last sampled round 5
    "agg_bitmap_distinct",
    "agg_boolean_predicates",
    "agg_corr_covar",
    "agg_grouping_sets",
    "agg_histogram_width_bucket",
    "agg_median_mode",
    "agg_string_agg_ordered",
    "cdc_scd2_history",
    "cdc_scd2_point_in_time",
    "corpus_prep_pipeline",
    "docs_chunk_windows",
    "docs_decontam_overlap",
    "docs_fingerprint",
    "docs_hash_sample",
    "docs_lang_id",
    "docs_lang_profile",
    "docs_pack_sequences",
    "docs_quality_score",
    "docs_redact",
    "docs_repetition",
    "docs_stratified_sample",
    "docs_tfidf",
    "docs_token_bpe_regex",
    "docs_token_stats",
    "docs_top_bigrams",
    "docs_unigram_logprob",
    "events_cohort_retention",
    "events_funnel_conversion",
    "events_linear_interp",
    # ---- slot 50 boundary: the eleven below overflow to round 12 ----
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
