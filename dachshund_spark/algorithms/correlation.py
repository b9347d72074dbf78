"""Correlation clustering via parallel pivot rounds.

Cluster a SIGNED graph (+ = same, − = different) minimizing
disagreements — the label-free clustering formulation (Bansal, Blum &
Chawla 2004).  KwikCluster picks a random pivot and clusters its
+neighborhood (expected 3-approx, Ailon et al. 2008); the
MapReduce-parallel version activates EVERY local-minimum-priority node
as a pivot each round (Chierichetti, Dalvi & Kumar KDD 2014), which is
exactly the hash-priority pattern this repo uses for MIS/coloring —
and with md5 priorities the whole run is deterministic and
SQL-replayable, no RNG state.

Per round over the still-active subgraph: (1) a node is a pivot iff
its priority is strictly below every active +neighbor's; (2) every
active non-pivot with a pivot +neighbor joins its smallest-priority
pivot neighbor; (3) pivots and joined nodes deactivate.  Adjacent
pivots are impossible (two strict minima cannot face each other), so
step 2 is well-defined.  Equal-priority neighbors (md5 collisions —
~2⁻⁶⁰ per pair) simply block each other's pivot condition and fall
through to the singleton finalization; both engines replay the same
behavior, so determinism survives even that.

Cost per round: one both-endpoints-active +edge join, two hub-safe min
aggregations, one state update — O(m⁺) with the active set (and the
work) shrinking geometrically; rounds past quiescence are no-ops, so
the fixed oracle unroll matches the early-stopping loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.pipeline.text import md5_long


def signed_edges(graph: LinkGraph, seed_tag: str = "#") -> DataFrame:
    """Canonical edges with the repo's seeded-synthetic md5-parity
    sign: ``[src, dst, sign]`` with sign ∈ {+1, −1}."""
    canon = graph.canonical_edges().select("src", "dst")
    h = md5_long(
        F.concat(
            F.col("src").cast("string"), F.lit(seed_tag), F.col("dst").cast("string")
        )
    )
    return canon.select(
        "src", "dst", F.when(h % 2 == 0, 1).otherwise(-1).alias("sign")
    )


def correlation_pivot(
    graph: LinkGraph, *, rounds: int = 12, seed: int = 0
) -> DataFrame:
    """Parallel-pivot correlation clusters: ``[node_id, cluster]`` —
    clusters labeled by their pivot's node id; nodes still active
    after ``rounds`` (or priority-tied) finalize as singletons."""
    pos = signed_edges(graph).where(F.col("sign") == 1).select("src", "dst")
    pos = pos.unionByName(
        pos.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().persist()
    pri = md5_long(
        F.concat(F.lit(f"cp{seed}#"), F.col("node_id").cast("string"))
    )
    state = (
        graph.nodes()
        .select("node_id", pri.alias("pri"), F.lit(None).cast("long").alias("cluster"))
        .localCheckpoint(eager=True)
    )
    for _ in range(int(rounds)):
        active = state.where(F.col("cluster").isNull()).select("node_id", "pri")
        act_e = (
            pos.join(
                active.select(F.col("node_id").alias("src"), F.col("pri").alias("ps")),
                on="src",
            )
            .join(active.select(F.col("node_id").alias("dst")), on="dst")
        )
        nbr_min = act_e.groupBy(F.col("dst").alias("node_id")).agg(
            F.min("ps").alias("_mn")
        )
        piv = (
            active.join(nbr_min, on="node_id", how="left")
            .where(F.col("_mn").isNull() | (F.col("pri") < F.col("_mn")))
            .select("node_id", "pri")
        )
        asg = (
            act_e.join(
                piv.select(F.col("node_id").alias("src")), on="src"
            )
            .groupBy(F.col("dst").alias("node_id"))
            .agg(F.min(F.struct(F.col("ps").alias("p"), F.col("src").alias("c"))).alias("m"))
            .select("node_id", F.col("m.c").alias("_joined"))
        )
        state = (
            state.join(
                piv.select("node_id", F.lit(1).alias("_is_piv")),
                on="node_id",
                how="left",
            )
            .join(asg, on="node_id", how="left")
            .select(
                "node_id",
                "pri",
                F.when(F.col("cluster").isNotNull(), F.col("cluster"))
                .when(F.col("_is_piv").isNotNull(), F.col("node_id"))
                .otherwise(F.col("_joined"))
                .alias("cluster"),
            )
            .localCheckpoint(eager=True)
        )
        if state.where(F.col("cluster").isNull()).limit(1).count() == 0:
            break
    pos.unpersist()
    return state.select(
        "node_id", F.coalesce("cluster", F.col("node_id")).alias("cluster")
    )


def correlation_disagreements(
    graph: LinkGraph, assign: DataFrame
) -> DataFrame:
    """Signed disagreement census of a clustering: one row
    ``[n_edges, intra_neg, inter_pos, disagreements]`` — the objective
    correlation clustering minimizes (− edges inside clusters plus
    + edges across them)."""
    pe = (
        signed_edges(graph)
        .join(
            assign.select(F.col("node_id").alias("src"), F.col("cluster").alias("ca")),
            on="src",
        )
        .join(
            assign.select(F.col("node_id").alias("dst"), F.col("cluster").alias("cb")),
            on="dst",
        )
    )
    intra = F.col("ca") == F.col("cb")
    return pe.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum((intra & (F.col("sign") == -1)).cast("int"))
        .cast("long")
        .alias("intra_neg"),
        F.sum(((~intra) & (F.col("sign") == 1)).cast("int"))
        .cast("long")
        .alias("inter_pos"),
        (
            F.sum((intra & (F.col("sign") == -1)).cast("int"))
            + F.sum(((~intra) & (F.col("sign") == 1)).cast("int"))
        )
        .cast("long")
        .alias("disagreements"),
    )
