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
#
# Registration order matters operationally: the driver's CORRECTNESS run
# samples the first 50 queries in registry iteration order.  Rounds 1-3
# always sampled the relational/TPC-H block, so the CDC/LLM/window/setop
# surface never earned a driver-side oracle row despite passing the full
# independent sweep (scripts/parity_sweep.py).  Order below puts the
# never-driver-verified modules first — cdc_state(6) + llm_dedup(8) +
# llm_similarity(5) + windows(7) + setops(9) + events_json(5) +
# collections(4) + udfs(3) + reshape(3) = exactly 50 — then llm_text +
# multimodal (next round's sample), then the three-rounds-green
# relational/TPC-H block.
# ROUND-5 NOTE: once CORRECTNESS_r04 lands green rows for the first-50
# sample below, rotate llm_text/multimodal/llm_extra/timeseries/sqlfns/
# sketches/funnels/scd into the leading positions so the next driver
# sample covers the still-unsampled surface (and relational/TPC-H, green
# in r1-r3, stays last). Do NOT reorder mid-round.
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
    "llm_extra",  # new in r4 — after the 50-query sample boundary
    "timeseries",
    "sqlfns",
    "sketches",
    "funnels",
    "scd",
    "llm_text",
    "multimodal",
    "relational",
    "tpch_extra",
    "tpch_rest",
    "joins",
    "subqueries",
    "aggregates",
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
    return dict(REGISTRY)
