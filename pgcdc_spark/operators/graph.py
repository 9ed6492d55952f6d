"""Iterative graph traversal: multi-source BFS / shortest hop counts.

Spark has no recursive CTE, so reachability ("which rows does this key
transitively touch within k steps") needs an engine operator. Same
iterative discipline as the connected-components dedup pass
(queries/llm_dedup.py): per-round state is the FRONTIER (newly reached
nodes only, never the whole graph), ``localCheckpoint`` truncates plan
lineage each round, and the single action per round is the frontier
count that doubles as the termination probe. Wall-clock rounds =
min(max_hops, graph diameter); each round is one equi-join frontier ⋈
edges + one anti join against the visited set — all shuffle-partitioned
on the node key, no driver-side graph state.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def shortest_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """(node, hops) = minimum number of directed edges from ANY source
    node, for every node reachable within ``max_hops`` (sources at 0).

    BFS visits each node at its first (minimal) depth, so the anti join
    against the visited set both prevents cycles and guarantees
    min-hop labels without a per-node aggregate."""
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    visited = (
        sources.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0).cast("int"))
        .localCheckpoint()
    )
    frontier = visited
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges[src_col])
            .select(F.col(dst_col).alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .withColumn("hops", F.lit(h).cast("int"))
            .localCheckpoint(eager=False)
        )
        if nxt.count() == 0:  # the one action per round; also materializes
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return visited
