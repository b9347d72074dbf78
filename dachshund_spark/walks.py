"""Deterministic random-walk corpus generation (DeepWalk-style).

Training-data pipelines for graph embeddings (DeepWalk / node2vec)
need billions of fixed-length random walks — a per-node corpus the
skip-gram stage consumes.  This operator generates them fully
distributed AND fully deterministically: the step-t choice out of node
v on walk (s, w) is ``md5(seed#s#w#t#v) % degree(v)`` over the node's
neighbors sorted by id, so there is no RNG state to ship, re-runs are
reproducible, and a SQL oracle can replay every walk exactly.

Per step: one join against the ranked adjacency (neighbor lists never
materialize as arrays — the pick is a (src, rn) equi-join, hub-safe)
plus the running path append.  Walks that hit a sink stop growing
(their path simply stays short).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.pipeline.text import md5_long
from dachshund_spark.util import gcols


def ranked_adjacency(graph: LinkGraph) -> DataFrame:
    """[g?, src, dst, rn, degree] — neighbors numbered 1..degree in
    ascending dst order (the deterministic pick table)."""
    from pyspark.sql import Window

    und = graph.undirected_edges()
    g = gcols(und)
    w = Window.partitionBy(*g, "src").orderBy("dst")
    deg = und.groupBy(*g, "src").agg(F.count("*").alias("degree"))
    return (
        und.withColumn("rn", F.row_number().over(w))
        .join(deg, on=g + ["src"])
    )


def random_walks(
    graph: LinkGraph,
    walk_length: int = 8,
    walks_per_node: int = 1,
    seed: int = 0,
) -> DataFrame:
    """[g?, start_node, walk_idx, walk] — ``walk`` is the '->'-joined
    node string (array semantics, serialized so downstream sorts and
    the driver's rows-only canonicalization both work)."""
    if walks_per_node < 1:
        raise ValueError("walks_per_node must be >= 1")
    if walk_length < 1:
        raise ValueError("walk_length must be >= 1")
    adj = ranked_adjacency(graph).persist()
    g = gcols(graph.edges)
    # static per-node degree lookup, computed once (NOT per step)
    deg_tbl = adj.select(*g, F.col("src").alias("cur"), "degree").distinct().persist()
    starts = graph.nodes().select(
        *g,
        F.col("node_id").alias("start_node"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("_wi"),
    ).select(*g, "start_node", F.col("_wi").cast("long").alias("walk_idx"))
    state = starts.select(
        *g,
        "start_node",
        "walk_idx",
        F.col("start_node").alias("cur"),
        F.col("start_node").cast("string").alias("walk"),
        F.lit(False).alias("done"),
    ).localCheckpoint(eager=True)

    for t in range(1, walk_length):
        pick = (
            F.pmod(
                md5_long(
                    F.concat_ws(
                        "#",
                        F.lit(seed),
                        F.col("start_node"),
                        F.col("walk_idx"),
                        F.lit(t),
                        F.col("cur"),
                    )
                ),
                F.col("degree"),
            )
            + 1
        )
        stepped = (
            state.where(~F.col("done"))
            .join(deg_tbl, on=g + ["cur"], how="left")
            .withColumn("_pick", F.when(F.col("degree").isNotNull(), pick))
        )
        moved = (
            stepped.where(F.col("_pick").isNotNull())
            .join(
                adj.select(
                    *g, F.col("src").alias("cur"), F.col("rn").alias("_pick"),
                    F.col("dst").alias("nxt"),
                ),
                on=g + ["cur", "_pick"],
            )
            .select(
                *g,
                "start_node",
                "walk_idx",
                F.col("nxt").alias("cur"),
                F.concat_ws("->", "walk", F.col("nxt")).alias("walk"),
                F.lit(False).alias("done"),
            )
        )
        stuck = stepped.where(F.col("_pick").isNull()).select(
            *g, "start_node", "walk_idx", "cur", "walk", F.lit(True).alias("done")
        )
        finished = state.where(F.col("done"))
        new_state = moved.unionByName(stuck).unionByName(finished).localCheckpoint(
            eager=True
        )
        # release the superseded snapshot: only ONE corpus copy stays
        # materialized, not walk_length of them
        state.unpersist()
        state = new_state
    deg_tbl.unpersist()
    adj.unpersist()
    return state.select(*g, "start_node", "walk_idx", "walk")
