"""Densest subgraph via parallel greedy peeling.

Bahmani, Kumar & Vassilvitskii (VLDB 2012): repeatedly delete every
node whose degree is ≤ 2(1+ε)·ρ̄ (ρ̄ = current |E|/|V|); the densest
round visited is a 2(1+ε)-approximation of the maximum-density
subgraph.  Because the threshold strictly exceeds the average degree,
at least an ε/(1+ε) fraction of nodes disappears per round, so the
loop is O(log n) rounds — the distributed replacement for Charikar's
inherently sequential one-node-at-a-time peel.

Scale shape per round: one degree aggregation (map-side combinable) +
two semi-joins to drop edges with a removed endpoint, then an eager
checkpoint; the round count is logarithmic, and the per-round scalars
(|E|, |V|) are single-row aggregates.  No collect of node sets, no
driver-side graph.

Oracle parity: round densities are single IEEE divisions of exact
integer counts (bit-identical across engines — no libm), and the peel
threshold ``2.0 * (1.0 + ε) * (m / n)`` is evaluated with the same
association on both sides; ε defaults to 0.5 (exactly representable).

The reference engine has no densest-subgraph operator; this is an
engine addition (SURVEY.md §2.12) — the standard spam-farm / link-farm
detector on web graphs (dense cores are almost always boilerplate
navigation or link spam).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.util import gcols


def densest_subgraph_history(
    graph: LinkGraph,
    *,
    epsilon: float = 0.5,
    max_rounds: int = 64,
) -> DataFrame:
    """Peel-round history ``[round, n_nodes, n_edges, density,
    is_best]`` — one row per non-empty round; ``is_best`` marks the
    densest round (ties → earliest), whose node set is the
    2(1+ε)-approximate densest subgraph.

    Single-graph only (the per-round peel threshold is a global
    scalar); grouped frames raise.
    """
    if epsilon <= 0:
        raise ValueError("epsilon must be > 0 (it drives the O(log n) bound)")
    if gcols(graph.edges):
        raise ValueError("densest_subgraph is single-graph only")
    spark = graph.edges.sparkSession
    cur = graph.canonical_edges().select("src", "dst").localCheckpoint(eager=True)
    history: list[tuple[int, int, int, float]] = []
    for t in range(int(max_rounds)):
        m = cur.count()
        if m == 0:
            break
        n = (
            cur.select(F.col("src").alias("x"))
            .union(cur.select(F.col("dst").alias("x")))
            .distinct()
            .count()
        )
        history.append((t, n, m, m / n))
        thr = 2.0 * (1.0 + epsilon) * (m / n)
        deg = (
            cur.select(F.col("src").alias("x"))
            .union(cur.select(F.col("dst").alias("x")))
            .groupBy("x")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.where(F.col("deg") > F.lit(thr)).select("x")
        nxt = (
            cur.join(keep.withColumnRenamed("x", "src"), on="src")
            .join(keep.withColumnRenamed("x", "dst"), on="dst")
            .select("src", "dst")
        ).localCheckpoint(eager=True)
        cur.unpersist()
        cur = nxt
    if not history:
        return spark.createDataFrame(
            [],
            "round long, n_nodes long, n_edges long, density double, is_best boolean",
        )
    # argmax density, ties -> earliest round; densities are exact IEEE
    # divisions of the same integers the oracle divides, so a float
    # compare is engine-stable
    best_round = max(history, key=lambda r: (r[3], -r[0]))[0]
    # densities stay raw here (callers round with F.round — HALF_UP —
    # matching SQL ROUND; Python round() is banker's and would diverge)
    rows = [(t, n, m, d, t == best_round) for (t, n, m, d) in history]
    return spark.createDataFrame(
        rows,
        "round long, n_nodes long, n_edges long, density double, is_best boolean",
    )


def densest_subgraph_nodes(
    graph: LinkGraph,
    *,
    epsilon: float = 0.5,
    max_rounds: int = 64,
) -> DataFrame:
    """Node set ``[node_id]`` of the best peel round (re-runs the peel
    to the best round — the history pass tells us *which* round, this
    pass re-materializes its survivors without ever collecting them)."""
    hist = densest_subgraph_history(
        graph, epsilon=epsilon, max_rounds=max_rounds
    )
    best = hist.where("is_best").select("round").first()
    if best is None:
        return graph.edges.sparkSession.createDataFrame([], "node_id long")
    target = best[0]
    cur = graph.canonical_edges().select("src", "dst").localCheckpoint(eager=True)
    for _ in range(int(target)):
        m = cur.count()
        if m == 0:
            break
        n = (
            cur.select(F.col("src").alias("x"))
            .union(cur.select(F.col("dst").alias("x")))
            .distinct()
            .count()
        )
        thr = 2.0 * (1.0 + epsilon) * (m / n)
        deg = (
            cur.select(F.col("src").alias("x"))
            .union(cur.select(F.col("dst").alias("x")))
            .groupBy("x")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.where(F.col("deg") > F.lit(thr)).select("x")
        nxt = (
            cur.join(keep.withColumnRenamed("x", "src"), on="src")
            .join(keep.withColumnRenamed("x", "dst"), on="dst")
            .select("src", "dst")
        ).localCheckpoint(eager=True)
        cur.unpersist()
        cur = nxt
    return (
        cur.select(F.col("src").alias("node_id"))
        .union(cur.select(F.col("dst").alias("node_id")))
        .distinct()
    )
