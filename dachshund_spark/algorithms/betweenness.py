"""Distributed Brandes betweenness (sampled sources).

The reference computes exact betweenness per graph in memory
(/root/reference/src/dachshund/algorithms/betweenness.rs:54-93) and its
featurizer samples ≤100 sources from the largest component
(simple_transformer.rs:45-51).  The pandas-island port
(local/kernels.py) keeps that shape; this module is the SCALE path —
the same Brandes forward/backward recurrence as synchronous DataFrame
supersteps over a (source, node) keyed state, so one web-scale graph
can be processed by the whole cluster instead of one task:

- forward: multi-source level BFS — every sampled source expands in
  the same superstep; state rows are (source, node, dist, σ) and each
  level is one edges-side join + one aggregation (σ summed as
  decimal(38,0) — tie-heavy graphs overflow longs).
- backward: levels walked in reverse; each level sends
  (0.5 + δ_w) · σ_p/σ_w along predecessor edges (dist(p) = dist(w)-1)
  — one join + one aggregation per level.  The 0.5 factor is the
  reference's undirected halving folded into the accumulation
  (betweenness.rs:75-84).

Job count = 2 · eccentricity ≈ 2 · diameter, independent of source
count — sampling more sources costs state width, not supersteps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.util import gcols


def sample_sources(
    graph: LinkGraph, sample: int, seed: int = 0
) -> DataFrame:
    """Deterministic per-graph source sample: the ``sample`` nodes with
    smallest md5(seed, node_id) (seeded stand-in for the reference's
    thread_rng choose, simple_transformer.rs:45-48)."""
    nodes = graph.nodes()
    g = gcols(nodes)
    h = F.md5(F.concat_ws("#", F.lit(seed), F.col("node_id")))
    if g:
        # per-graph top-k: the window partitions on graph_id (groups
        # are fixture-sized by the multi-graph contract)
        w = Window.partitionBy(*g).orderBy(h)
        return (
            nodes.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= sample)
            .select(*g, F.col("node_id").alias("source"))
        )
    # single-graph: orderBy+limit compiles to TakeOrderedAndProject
    # (per-partition top-k + driver merge of `sample` rows) — same
    # deterministic set as the row_number window, without funneling
    # every node through one window task
    return (
        nodes.withColumn("_h", h)
        .orderBy("_h")
        .limit(sample)
        .select(F.col("node_id").alias("source"))
    )


def betweenness_sampled(
    graph: LinkGraph,
    sources: DataFrame | None = None,
    sample: int | None = None,
    seed: int = 0,
    max_depth: int = 10_000,
    _edge_scores: bool = False,
) -> DataFrame:
    """[g?, node_id, betweenness] — Brandes restricted to the given
    sources (all nodes when both ``sources`` and ``sample`` are None:
    exact betweenness, matching the local kernel to float tolerance).

    ``_edge_scores=True`` (internal; use :func:`edge_betweenness_sampled`)
    returns per-EDGE scores instead: ``[g?, u, v, betweenness]`` with
    u < v — the same backward pass aggregated on the traversed edge
    before the per-node fold, so it costs one extra (already-shuffled)
    aggregation per level and nothing in the forward pass.
    """
    und = graph.undirected_edges().persist()
    g = gcols(und)
    if sources is None:
        if sample is not None:
            sources = sample_sources(graph, sample, seed)
        else:
            sources = graph.nodes().select(*g, F.col("node_id").alias("source"))
    else:
        # caller-supplied sources: duplicate rows would double-count σ
        # and dependencies (inflating betweenness); ids absent from the
        # graph contribute nothing, which is fine, but dupes are not
        sources = sources.select(*g, "source").distinct()

    # ---- forward: multi-source BFS with σ ---------------------------
    settled = (
        sources.select(*g, "source")
        .withColumn("node_id", F.col("source"))
        .withColumn("dist", F.lit(0))
        .withColumn("sigma", F.lit(1).cast("decimal(38,0)"))
        .localCheckpoint(eager=True)
    )
    frontier = settled
    depth = 0
    while depth < max_depth:
        depth += 1
        expanded = (
            und.join(
                frontier.select(*g, "source", F.col("node_id").alias("src"), "sigma"),
                on=g + ["src"],
            )
            .select(*g, "source", F.col("dst").alias("node_id"), "sigma")
            .join(
                settled.select(*g, "source", "node_id"),
                on=g + ["source", "node_id"],
                how="left_anti",
            )
            .groupBy(*g, "source", "node_id")
            .agg(F.sum("sigma").alias("sigma"))
            .withColumn("dist", F.lit(depth))
            .select(*g, "source", "node_id", "dist", "sigma")
            .localCheckpoint(eager=True)
        )
        if expanded.isEmpty():
            depth -= 1
            break
        settled = settled.union(expanded)
        if depth % 5 == 0:
            settled = settled.localCheckpoint(eager=True)
        frontier = expanded

    settled = settled.localCheckpoint(eager=True)

    # ---- backward: dependency accumulation, deepest level first -----
    # dep rows exist only once a node receives a contribution; nodes at
    # the deepest level have dep 0 (no successors).
    dep = None  # [g?, source, node_id, dep]
    edge_acc: list[DataFrame] = []  # per-level [g?, src, dst, c]
    for lvl in range(depth, 0, -1):
        w_lvl = settled.where(F.col("dist") == lvl).select(
            *g, "source", F.col("node_id").alias("dst"),
            F.col("sigma").alias("sigma_w"),
        )
        if dep is not None:
            w_lvl = w_lvl.join(
                dep.select(*g, "source", F.col("node_id").alias("dst"),
                           F.col("dep").alias("dep_w")),
                on=g + ["source", "dst"],
                how="left",
            )
        else:
            w_lvl = w_lvl.withColumn("dep_w", F.lit(None).cast("double"))
        # predecessors p of w: edge (p, w) with dist(p) = lvl-1
        preds = settled.where(F.col("dist") == lvl - 1).select(
            *g, "source", F.col("node_id").alias("src"),
            F.col("sigma").alias("sigma_p"),
        )
        contrib_pre = (
            und.join(w_lvl, on=g + ["dst"])
            .join(preds, on=g + ["source", "src"])
            .select(
                *g,
                "source",
                "src",
                "dst",
                (
                    (F.lit(0.5) + F.coalesce("dep_w", F.lit(0.0)))
                    * (F.col("sigma_p").cast("double") / F.col("sigma_w").cast("double"))
                ).alias("c"),
            )
        )
        if _edge_scores:
            edge_acc.append(
                contrib_pre.groupBy(*g, "src", "dst")
                .agg(F.sum("c").alias("c"))
                .localCheckpoint(eager=True)
            )
        contrib = (
            contrib_pre.select(*g, "source", F.col("src").alias("node_id"), "c")
            .groupBy(*g, "source", "node_id")
            .agg(F.sum("c").alias("new_dep"))
        )
        merged = (
            contrib
            if dep is None
            else dep.join(contrib, on=g + ["source", "node_id"], how="full")
            .select(
                *g, "source", "node_id",
                (F.coalesce("dep", F.lit(0.0)) + F.coalesce("new_dep", F.lit(0.0))).alias("new_dep"),
            )
        )
        dep = merged.withColumnRenamed("new_dep", "dep").localCheckpoint(eager=True)

    und.unpersist()
    if _edge_scores:
        canon = graph.undirected_edges().where(F.col("src") < F.col("dst"))
        canon = canon.select(
            *g, F.col("src").alias("u"), F.col("dst").alias("v")
        )
        if not edge_acc:
            return canon.withColumn("betweenness", F.lit(0.0))
        acc = edge_acc[0]
        for e in edge_acc[1:]:
            acc = acc.unionByName(e)
        # the DAG directs each undirected edge per source; fold both
        # orientations onto the canonical (min, max) pair
        scores = acc.groupBy(
            *g,
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        ).agg(F.sum("c").alias("betweenness"))
        return canon.join(scores, on=g + ["u", "v"], how="left").select(
            *g,
            "u",
            "v",
            F.coalesce("betweenness", F.lit(0.0)).alias("betweenness"),
        )
    nodes = graph.nodes()
    if dep is None:
        return nodes.withColumn("betweenness", F.lit(0.0))
    bet = (
        dep.where(F.col("node_id") != F.col("source"))
        .groupBy(*g, "node_id")
        .agg(F.sum("dep").alias("betweenness"))
    )
    return nodes.join(bet, on=g + ["node_id"], how="left").select(
        *g, "node_id", F.coalesce("betweenness", F.lit(0.0)).alias("betweenness")
    )


def edge_betweenness_sampled(
    graph: LinkGraph,
    sources: DataFrame | None = None,
    sample: int | None = None,
    seed: int = 0,
    max_depth: int = 10_000,
) -> DataFrame:
    """Girvan-Newman edge betweenness: ``[g?, u, v, betweenness]``
    with u < v over the symmetrized simple graph (exact when sources
    is all nodes, else the sampled estimate).

    Same forward BFS and backward dependency recurrence as
    :func:`betweenness_sampled`; the per-edge score is the
    (0.5 + δ_w)·σ_p/σ_w contribution aggregated on the traversed edge
    before the per-node fold — the halving matches the node
    convention (each s,t pair is visited from both endpoints).
    Untraversed edges (none, on a connected source set) score 0.0.
    """
    return betweenness_sampled(
        graph, sources, sample, seed, max_depth, _edge_scores=True
    )
