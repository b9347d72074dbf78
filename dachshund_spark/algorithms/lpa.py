"""Synchronous label propagation with deterministic tie-breaking.

Dachshund has no LPA (its community detector is sequential CNM greedy
modularity, /root/reference/src/dachshund/algorithms/cnm_communities.rs:79-281
— reproduced in the pandas-UDF local pack); LPA is the scalable
counterpart required by the north rule.  Semantics are pinned so golden
tables are stable (SURVEY.md §2.11 note d):

- init: label(v) = v
- superstep: label'(v) = the modal label among v's neighbors, ties
  broken by the smallest label; isolated nodes keep their own label
- synchronous updates, fixed iteration count (sync LPA can oscillate
  on bipartite structures, so termination is a superstep budget, with
  an optional early stop when no label changes)

Every superstep is one join + one count aggregation + one ``max_by``
aggregation — all JVM-side, partial-aggregated, hub-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.checkpoint import CheckpointManager
from dachshund_spark.graph import LinkGraph
from dachshund_spark.iterate import run_fixpoint
from dachshund_spark.util import gcols, hinted


def label_propagation(
    graph: LinkGraph,
    *,
    iterations: int = 10,
    early_stop: bool = False,
    join_hint: str | None = None,
    manager: CheckpointManager | None = None,
    durable_checkpoint_every: int = 5,
    resume: bool = True,
) -> DataFrame:
    """Returns ``[graph_id?, node_id, label]`` after ``iterations``
    synchronous supersteps."""
    und = graph.undirected_edges().persist()
    g = gcols(und)
    labels0 = graph.nodes().withColumn("label", F.col("node_id"))

    def step(state: DataFrame, superstep: int) -> DataFrame:
        nbr = und.join(
            hinted(state.withColumnRenamed("node_id", "src"), join_hint),
            on=g + ["src"],
        ).select(*g, F.col("dst").alias("node_id"), "label")
        counts = nbr.groupBy(*g, "node_id", "label").agg(F.count("*").alias("cnt"))
        # modal label, ties -> smallest label: single max_by aggregation
        modal = counts.groupBy(*g, "node_id").agg(
            F.expr("max_by(label, struct(cnt, -label))").alias("new_label")
        )
        return state.join(modal, on=g + ["node_id"], how="left").select(
            *g,
            "node_id",
            F.coalesce("new_label", "label").alias("label"),
        )

    converged = None
    if early_stop:

        def converged(prev: DataFrame, new: DataFrame) -> tuple[bool, dict]:
            changed = (
                new.withColumnRenamed("label", "nl")
                .join(prev, on=g + ["node_id"])
                .where(F.col("nl") != F.col("label"))
                .count()
            )
            return changed == 0, {"changed": changed}

    final, _ = run_fixpoint(
        labels0,
        step,
        converged=converged,
        max_iterations=iterations,
        manager=manager,
        durable_checkpoint_every=durable_checkpoint_every,
        resume=resume,
    )
    und.unpersist()
    return final
