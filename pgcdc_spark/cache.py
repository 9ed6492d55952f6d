"""Deterministic lifecycle for shared (persist()'d) subplans.

Some queries persist() an intermediate DataFrame because it feeds several
consumers inside one returned plan (e.g. the LSH candidate list in
``verified_candidate_pairs`` — without sharing, every consumer re-runs the
dominant shingle->minhash->bucket pipeline).  persist() is the right
sharing mechanism — it is lazy (no job at plan-build time) and
spill-capable — but Spark's CacheManager holds the blocks until an
explicit unpersist, so a long-lived session that calls such a query
repeatedly (the bench loop, the driver's 50-query sweep) accumulates dead
MEMORY_AND_DISK blocks until LRU eviction.

This module makes the release explicit: query code registers every shared
frame through :func:`shared`, and every harness that runs a query action
(oracle parity runner, bench, tests) calls :func:`release_shared` after
the action.  External callers that use query functions directly get the
same hook; if they skip it, behavior degrades to the old LRU-eviction
bound, never to a correctness problem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def shared(df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK) -> DataFrame:
    """persist() ``df`` and track it for deterministic release.

    Lazy: no job runs here; the single final action materializes the
    shared subplan exactly once (MEMORY_AND_DISK so memory pressure
    spills instead of recomputing).
    """
    df = df.persist(level)
    _TRACKED.append(df)
    return df


def release_shared(blocking: bool = False) -> int:
    """Unpersist every tracked frame; returns how many were released.

    Call after the consuming action.  Safe to call when nothing is
    tracked, and safe to call twice (unpersist is idempotent).
    """
    n = 0
    while _TRACKED:
        _TRACKED.pop().unpersist(blocking)
        n += 1
    return n
