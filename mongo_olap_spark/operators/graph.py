"""$graphLookup: bounded-depth graph traversal.

Spark SQL has no recursive queries, so traversal is a driver-side
loop of equi self-joins to a fixpoint (or depth bound) — the public
pattern for iterative algorithms on DataFrames. Each iteration is one
join that Catalyst plans independently (broadcast when the frontier
is small — the common case, since frontiers shrink or stay bounded).

Scale notes: frontier DataFrames are localCheckpoint()ed each
iteration to cut the growing lineage (otherwise plan size doubles per
hop); for unbounded traversals at 100 TB use GraphFrames/Pregel-style
partitioned iteration — this operator covers the reference domain's
bounded $graphLookup (maxDepth) semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def graph_lookup(
    starts: DataFrame,
    edges: DataFrame,
    *,
    max_depth: int = 3,
    start_col: str = "start_key",
    src_col: str = "src",
    dst_col: str = "dst",
    dedupe: bool = True,
) -> DataFrame:
    """All nodes reachable from each start within ``max_depth`` hops.

    Returns (start_key, node, depth) with depth ≥ 1; a node reached at
    several depths reports the shallowest (when ``dedupe``).
    """
    frontier = starts.select(
        F.col(start_col).alias("start_key"), F.col(start_col).alias("node")
    )
    out: DataFrame | None = None
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges[src_col])
            .select("start_key", F.col(dst_col).alias("node"))
        )
        if dedupe:
            nxt = nxt.dropDuplicates(["start_key", "node"])
        nxt = nxt.localCheckpoint(eager=True)  # cut lineage growth per hop
        if nxt.isEmpty():
            break
        step = nxt.withColumn("depth", F.lit(depth))
        out = step if out is None else out.unionByName(step)
        frontier = nxt
    if out is None:
        schema_src = starts.sparkSession
        return schema_src.createDataFrame([], "start_key long, node long, depth int")
    if dedupe:
        # keep shallowest depth per (start, node)
        out = out.groupBy("start_key", "node").agg(F.min("depth").cast("int").alias("depth"))
    return out
