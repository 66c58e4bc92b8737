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
    max_depth: int | None = 3,
    start_col: str = "start_key",
    src_col: str = "src",
    dst_col: str = "dst",
    dedupe: bool = True,
) -> DataFrame:
    """All nodes reachable from each start within ``max_depth`` hops —
    or to EXHAUSTION when ``max_depth`` is None (Mongo's $graphLookup
    default). Exhaustive traversal requires ``dedupe``: the BFS then
    subtracts already-visited (start, node) pairs each hop, so cycles
    terminate (frontier empties once nothing NEW is reachable) and
    each node reports its shallowest depth by construction.

    Returns (start_key, node, depth) with depth ≥ 1. The start node
    itself is never reported (visited at depth 0 before the walk),
    matching Mongo's visited-document tracking on cyclic graphs.
    """
    if max_depth is None and not dedupe:
        raise ValueError("unbounded graph_lookup requires dedupe=True")
    frontier = starts.select(
        F.col(start_col).alias("start_key"), F.col(start_col).alias("node")
    )
    seen = frontier  # visited set, start nodes included

    def _expand(fr: DataFrame) -> DataFrame:
        nxt = fr.join(edges, fr.node == edges[src_col]).select(
            "start_key", F.col(dst_col).alias("node")
        )
        if dedupe:
            # only NEWLY discovered pairs continue: min-depth falls out
            # of BFS order, and cyclic graphs terminate
            nxt = nxt.dropDuplicates(["start_key", "node"]).join(
                seen, ["start_key", "node"], "left_anti")
        return nxt

    out: DataFrame | None = None
    depth = 0
    while max_depth is None or depth < max_depth:
        # optimization r17 (guide §2.6 — halve the per-round driver
        # barriers): TWO hops per round. hop2 expands hop1 inside the
        # same query, subtracting hop1 itself (a node reachable at
        # both d+1 and d+2 keeps its shallower depth); both hops
        # materialize in ONE localCheckpoint action — hop1's
        # dropDuplicates exchange is computed once and read back by
        # the hop2 branch via ReusedExchange. Rounds (checkpoint +
        # isEmpty + seen maintenance) drop from maxDepth to
        # ceil(maxDepth/2).
        hop1 = _expand(frontier)
        two = (max_depth is None or depth + 2 <= max_depth) and dedupe
        if two:
            hop2 = _expand(hop1).join(hop1, ["start_key", "node"],
                                      "left_anti")
            step = hop1.withColumn("depth", F.lit(depth + 1)).unionByName(
                hop2.withColumn("depth", F.lit(depth + 2)))
        else:
            step = hop1.withColumn("depth", F.lit(depth + 1))
        step = step.localCheckpoint(eager=True)  # cut lineage per round
        if step.isEmpty():
            break
        out = step if out is None else out.unionByName(step)
        nodes_new = step.select("start_key", "node")
        if dedupe:
            # lazy checkpoint: the union materializes inside the next
            # round's checkpoint action instead of costing its own job
            seen = seen.unionByName(nodes_new).localCheckpoint(eager=False)
        depth += 2 if two else 1
        frontier = step.filter(F.col("depth") == depth).select(
            "start_key", "node")
        if two and frontier.isEmpty():
            break
    if out is None:
        # schema mirrors the live-path output: start/node keep their
        # REAL types (a string-keyed graph with zero reachable hops
        # previously produced a hardcoded-long frame that failed the
        # caller's union)
        from pyspark.sql.types import IntegerType, StructField, StructType

        schema = StructType([
            StructField("start_key", starts.schema[start_col].dataType),
            StructField("node", edges.schema[dst_col].dataType),
            StructField("depth", IntegerType()),
        ])
        return starts.sparkSession.createDataFrame([], schema)
    if dedupe:
        # shallowest depth per (start, node); with subtraction each
        # pair appears once, keep the agg as a safety invariant
        out = out.groupBy("start_key", "node").agg(F.min("depth").cast("int").alias("depth"))
    return out
