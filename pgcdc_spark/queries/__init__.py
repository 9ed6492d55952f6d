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
# run samples the first 50 queries in iteration order.  Rounds 1-5
# cumulatively greenlit 149/158 names; the 9 below have never earned a
# driver-side green row (8 were added in round 5 after that round's
# rotation was fixed; mm_extract_features needed the round-6 f0..f7
# canonicalization fix + full oracle).  all_queries() yields these first —
# then round-6 additions, then every already-driver-green query in
# registration order.  Do NOT reorder mid-round.
_PRIORITY = (
    # never driver-sampled (8, all pass scripts/parity_sweep.py)
    "mm_audio_resample",
    "merge_into_customer_orders",
    "profile_orders_columns",
    "dq_expectations_orders",
    "graph_bfs_hops",
    "udf_sql_registered",
    "cdc_widening_state",
    "docs_weighted_sample",
    # driver-red in r5 (array<float> canonicalization); now emits scalar
    # f0..f7 against a full arithmetic oracle
    "mm_extract_features",
    # round-6 new surface
    "emb_ann_index_probe",
    "ivm_agg_view_state",
    "ivm_minmax_view_state",
    "ivm_join_view_state",
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
