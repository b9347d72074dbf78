"""BFS single-source shortest paths (unweighted) with predecessor sets.

Reference semantics
(/root/reference/src/dachshund/algorithms/shortest_paths.rs:15-119):
unweighted Dijkstra ≡ BFS; keeps **all** tie predecessors
(``alt <= dist``, :59-62); the source lists itself as its only parent
(:66); unreachable nodes have no distance (None).  The BFS variant also
tracks σ (count of distinct shortest paths) for Brandes.

Distributed formulation: frontier join per level —
``frontier ⋈ edges → groupBy(dst)`` with min-dist, parent collection,
and σ summation.  Level count = eccentricity of the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.util import gcols


def bfs_sssp(
    graph: LinkGraph,
    source: int,
    max_depth: int = 10_000,
) -> DataFrame:
    """Returns [g?, node_id, dist, parents, sigma] for reachable nodes.

    ``parents`` is the sorted array of all shortest-path predecessors
    (source's parents = [source]); ``sigma`` is the number of shortest
    paths from the source.  One row per reachable node — unreachable
    nodes are simply absent (the reference returns None distances).
    """
    und = graph.undirected_edges().persist()
    g = gcols(und)
    graphs = und.select(*g).distinct() if g else None

    if g:
        settled = graphs.withColumn("node_id", F.lit(source).cast("long"))
    else:
        settled = und.sparkSession.createDataFrame([(source,)], "node_id long")
    settled = (
        settled.withColumn("dist", F.lit(0))
        .withColumn("parents", F.array(F.lit(source).cast("long")))
        # σ (shortest-path counts) grows multiplicatively per level and
        # can exceed 2^63 on tie-heavy graphs (grids/lattices); decimal
        # accumulation (38 digits) avoids ANSI-mode overflow traps
        .withColumn("sigma", F.lit(1).cast("decimal(38,0)"))
    )
    # restrict to graphs that actually contain the source node
    if g:
        present = graph.nodes().where(F.col("node_id") == source).select(*g)
        settled = settled.join(present, on=g)
    settled = settled.localCheckpoint(eager=True)

    frontier = settled
    depth = 0
    while depth < max_depth:
        depth += 1
        expanded = (
            und.join(
                frontier.select(*g, F.col("node_id").alias("src"), "sigma"),
                on=g + ["src"],
            )
            .select(*g, F.col("dst").alias("node_id"), F.col("src").alias("parent"), "sigma")
            .join(settled.select(*g, "node_id"), on=g + ["node_id"], how="left_anti")
            .groupBy(*g, "node_id")
            .agg(
                F.sort_array(F.collect_set("parent")).alias("parents"),
                F.sum("sigma").alias("sigma"),
            )
            .withColumn("dist", F.lit(depth))
            .select(*g, "node_id", "dist", "parents", "sigma")
        )
        # the frontier is referenced twice next level (expansion +
        # anti-join through settled's union), so truncate its lineage
        # every level or the plan doubles per level
        expanded = expanded.localCheckpoint(eager=True)
        if expanded.isEmpty():
            break
        new_settled = settled.union(expanded)
        if depth % 5 == 0:
            new_settled = new_settled.localCheckpoint(eager=True)
        settled = new_settled
        frontier = expanded
    und.unpersist()
    return settled


def all_distances(graph: LinkGraph, source: int, **kwargs) -> DataFrame:
    """Distances for every node (null for unreachable) — matches the
    reference's Option<u32> map (shortest_paths.rs:15-68)."""
    g = gcols(graph.edges)
    reached = bfs_sssp(graph, source, **kwargs).select(*g, "node_id", "dist")
    return graph.nodes().join(reached, on=g + ["node_id"], how="left")
