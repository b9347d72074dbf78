"""Luby's maximal independent set as DataFrame supersteps.

Dachshund has no MIS; it is the classic symmetry-breaking primitive for
distributed graph processing (Luby 1986) and the building block for
coordination-free scheduling (e.g. picking non-adjacent crawl frontier
batches so no two fetched hosts share an edge).  Expected O(log n)
supersteps.

Determinism contract: each node's priority is an md5-derived bigint of
``"mis{seed}#" + node_id`` (no RNG — reproducible across runs, engines,
and partitionings), totally ordered by the ``(priority, node_id)`` pair
so hash collisions cannot livelock two adjacent nodes.  A node enters
the MIS when its pair strictly exceeds every ACTIVE neighbor's pair;
its active neighbors are then removed, and the round repeats on the
shrinking active subgraph.

Each superstep is two equi-joins against the (persisted) symmetric edge
table plus one max aggregation — all JVM-side and partial-aggregated;
the max over ``struct(priority, node)`` is hub-safe (a 10^6-degree
hub's incoming messages reduce map-side to one struct per partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.checkpoint import CheckpointManager
from dachshund_spark.graph import LinkGraph
from dachshund_spark.iterate import run_fixpoint
from dachshund_spark.util import gcols


def _priority(seed: int) -> F.Column:
    tag = F.lit(f"mis{seed}#")
    return F.conv(
        F.substring(F.md5(F.concat(tag, F.col("node_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


def maximal_independent_set(
    graph: LinkGraph,
    *,
    seed: int = 0,
    max_iterations: int = 64,
    manager: CheckpointManager | None = None,
    durable_checkpoint_every: int = 5,
    resume: bool = True,
) -> DataFrame:
    """Returns ``[graph_id?, node_id, in_mis]`` for every node.

    Runs until the active set is empty (guaranteed: every round decides
    at least the globally highest-priority active node) or
    ``max_iterations`` supersteps, whichever first.  Output is a
    maximal independent set: no two MIS nodes are adjacent, and every
    non-MIS node has a MIS neighbor.
    """
    und = graph.undirected_edges().persist()
    g = gcols(und)
    # status: 0 = active (undecided), 1 = in MIS, 2 = removed
    state0 = (
        graph.nodes()
        .withColumn("pr", _priority(seed))
        .withColumn("status", F.lit(0))
    )

    def step(state: DataFrame, superstep: int) -> DataFrame:
        active = state.where(F.col("status") == 0).select(*g, "node_id", "pr")
        asrc = active.select(
            *g, F.col("node_id").alias("src"), F.col("pr").alias("src_pr")
        )
        adst = active.select(*g, F.col("node_id").alias("dst"))
        # edges of the current ACTIVE subgraph, carrying src priority
        ae = und.select(*g, "src", "dst").join(asrc, on=g + ["src"]).join(
            adst, on=g + ["dst"]
        )
        key = lambda p, n: F.struct(F.col(p).alias("p"), F.col(n).alias("n"))
        nbr_max = ae.groupBy(*g, "dst").agg(
            F.max(key("src_pr", "src")).alias("mx")
        )
        winners = (
            active.join(
                nbr_max.withColumnRenamed("dst", "node_id"),
                on=g + ["node_id"],
                how="left",
            )
            .where(F.col("mx").isNull() | (key("pr", "node_id") > F.col("mx")))
            .select(*g, "node_id")
        )
        removed = (
            ae.join(winners.withColumnRenamed("node_id", "src"), on=g + ["src"])
            .select(*g, F.col("dst").alias("node_id"))
            .distinct()
        )
        return (
            state.join(winners.withColumn("_w", F.lit(1)), on=g + ["node_id"], how="left")
            .join(removed.withColumn("_r", F.lit(1)), on=g + ["node_id"], how="left")
            .select(
                *g,
                "node_id",
                "pr",
                F.when(F.col("status") != 0, F.col("status"))
                .when(F.col("_w") == 1, F.lit(1))
                .when(F.col("_r") == 1, F.lit(2))
                .otherwise(F.lit(0))
                .alias("status"),
            )
        )

    def converged(prev: DataFrame, new: DataFrame) -> tuple[bool, dict]:
        remaining = new.where(F.col("status") == 0).count()
        return remaining == 0, {"active": remaining}

    final, _ = run_fixpoint(
        state0,
        step,
        converged=converged,
        max_iterations=max_iterations,
        manager=manager,
        durable_checkpoint_every=durable_checkpoint_every,
        resume=resume,
    )
    und.unpersist()
    return final.select(*g, "node_id", (F.col("status") == 1).alias("in_mis"))
