"""Balanced label-propagation graph partitioning (Spinner-style).

Assigning a 100 TB link graph to k workers wants edge-locality
(neighbors co-located) under a balance constraint — the problem
Spinner (Martella et al. 2017) and balanced label propagation
(Ugander & Backstrom 2013) solve with penalized LPA.  This is the
deterministic, SQL-replayable variant of that family: every migration
decision is an integer argmax over a node's neighbor-label census
minus a global load penalty, and update order is a seeded md5 parity
schedule instead of random sampling, so the whole run replays exactly
(the repo's coloring/rewire convention for synchronized randomized
rounds).

Score: a node of degree d considering part p with c neighbors in p
while p currently holds L nodes maximizes

    score(p) = c·n − d·L        (= d·n · (c/d − L/n), λ = 1)

— the locality share has to beat the load share, so overloaded parts
shed nodes and neighbor-majority parts attract them.  Ties break to
the smallest part id.  Only nodes whose md5 parity matches the round
parity migrate (anti-oscillation half-stepping).

Per round: one edges⋈state join + (node, part) count (hub-safe partial
aggregation), one k-row broadcast of the load census, one struct-max
argmax — no windows, no collects beyond the fixed n scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.pipeline.text import md5_long


def balanced_partition(
    graph: LinkGraph,
    *,
    k: int = 4,
    rounds: int = 8,
    seed: int = 0,
) -> DataFrame:
    """Spinner-style balanced k-way partition: ``[node_id, part]``.

    Init: ``part = md5 % k`` (fully distributed).  Each round, the
    parity-scheduled half of the nodes moves to the neighbor-census
    part maximizing ``c·n − d·L`` (see module docstring); the argmax
    is a single struct-max aggregation, identical in DuckDB.
    """
    und = graph.undirected_edges().select("src", "dst").persist()
    deg = (
        und.groupBy(F.col("src").alias("node_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    init_part = (
        md5_long(F.concat(F.lit(f"sp{seed}#"), F.col("node_id").cast("string")))
        % F.lit(int(k))
    ).cast("long")
    parity = (
        md5_long(F.concat(F.lit(f"spu{seed}#"), F.col("node_id").cast("string")))
        % F.lit(2)
    ).cast("long")
    state = (
        graph.nodes()
        .join(deg, on="node_id", how="left")
        .select(
            "node_id",
            init_part.alias("part"),
            F.coalesce("degree", F.lit(0)).cast("long").alias("degree"),
            parity.alias("upd"),
        )
        .localCheckpoint(eager=True)
    )
    n = state.count()  # fixed scalar (one bounded driver handoff)
    kl = F.lit(int(k))
    for r in range(1, int(rounds) + 1):
        load = state.groupBy("part").agg(
            F.count(F.lit(1)).cast("long").alias("load")
        )
        cnt = (
            und.join(
                state.select(F.col("node_id").alias("src"), F.col("part")),
                on="src",
            )
            .groupBy(F.col("dst").alias("node_id"), "part")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )
        best = (
            cnt.join(F.broadcast(load), on="part")
            .join(state.select("node_id", "degree"), on="node_id")
            .select(
                "node_id",
                F.struct(
                    (F.col("cnt") * F.lit(int(n)) - F.col("degree") * F.col("load"))
                    .cast("long")
                    .alias("s"),
                    (kl - F.col("part")).cast("long").alias("np"),
                ).alias("sc"),
            )
            .groupBy("node_id")
            .agg(F.max("sc").alias("m"))
            .select("node_id", (kl - F.col("m.np")).cast("long").alias("newp"))
        )
        state = (
            state.join(best, on="node_id", how="left")
            .select(
                "node_id",
                F.when(
                    (F.col("upd") == F.lit(r % 2)) & F.col("newp").isNotNull(),
                    F.col("newp"),
                )
                .otherwise(F.col("part"))
                .alias("part"),
                "degree",
                "upd",
            )
            .localCheckpoint(eager=True)
        )
    und.unpersist()
    return state.select("node_id", "part")


def partition_quality(graph: LinkGraph, assign: DataFrame) -> DataFrame:
    """Per-part quality census of a node→part assignment:
    ``[part, n_nodes, intra_edges, cut_edges]`` over the canonical
    (src < dst, deduped) edge set.

    ``intra_edges`` are edges with both endpoints in the part;
    ``cut_edges`` counts each crossing edge once for EACH of its two
    parts (so Σ cut_edges = 2·|cut|) — the per-worker communication
    volume a partitioner is minimizing, which is exactly how you grade
    one.  Two joins against the assignment plus two bounded (≤k-row)
    aggregations.
    """
    canon = graph.canonical_edges().select("src", "dst")
    pe = canon.join(
        assign.select(F.col("node_id").alias("src"), F.col("part").alias("pa")),
        on="src",
    ).join(
        assign.select(F.col("node_id").alias("dst"), F.col("part").alias("pb")),
        on="dst",
    )
    nn = assign.groupBy("part").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    intra = (
        pe.where(F.col("pa") == F.col("pb"))
        .groupBy(F.col("pa").alias("part"))
        .agg(F.count(F.lit(1)).cast("long").alias("intra_edges"))
    )
    crossing = pe.where(F.col("pa") != F.col("pb"))
    cut = (
        crossing.select(F.col("pa").alias("part"))
        .unionAll(crossing.select(F.col("pb").alias("part")))
        .groupBy("part")
        .agg(F.count(F.lit(1)).cast("long").alias("cut_edges"))
    )
    return (
        nn.join(intra, on="part", how="left")
        .join(cut, on="part", how="left")
        .select(
            "part",
            "n_nodes",
            F.coalesce("intra_edges", F.lit(0)).cast("long").alias("intra_edges"),
            F.coalesce("cut_edges", F.lit(0)).cast("long").alias("cut_edges"),
        )
    )
