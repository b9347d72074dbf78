"""Strongly connected components + web bow-tie decomposition.

Dachshund's components are undirected-only
(/root/reference/src/dachshund/algorithms/connected_components.rs:26-70);
a directed url→url crawl graph additionally needs SCCs — the classic
web bow-tie (Broder et al., "Graph structure in the Web", 2000) is
defined relative to the giant SCC.

Algorithm: distributed coloring (Orzan 2004 / the FW-BW-Trim family as
adapted for vertex-centric systems, e.g. Pregel+/GraphFrames):

repeat until every node is labeled:
  1. **Trim** — iteratively peel nodes with no in-edges or no
     out-edges inside the remaining subgraph; each is its own
     singleton SCC.  On web-shaped (mostly-DAG) graphs this removes
     the bulk of the nodes in a couple of sweeps.
  2. **Forward max-coloring** — fixpoint: color(v) = max(color(v),
     color(u) for u→v), so color(v) = the largest node id that
     reaches v.
  3. **Backward containment** — fixpoint within each color class:
     from the color root r (color(r) == r), walk reverse edges
     restricted to nodes of the same color; every node reached both
     reaches r (the walk) and is reached by r (the color), so the
     reached set IS SCC(r).  Label it, remove it, repeat.

Every phase is a run_fixpoint of joins + aggregations (no collect of
node sets, hub-safe partial aggregation); the outer loop peels at
least one SCC per color class per round, and real crawl graphs finish
in a handful of rounds.  ``scc_id`` is the smallest member id —
the same scale-stable labeling convention as undirected CC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.iterate import _stats_barrier, run_fixpoint
from dachshund_spark.util import gcols, hinted


def _ckpt(df: DataFrame) -> DataFrame:
    return _stats_barrier(df.localCheckpoint(eager=True))


def _trim(
    edges: DataFrame, nodes: DataFrame, g: list[str]
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Peel no-in / no-out nodes; returns (edges, nodes, trimmed)."""
    trimmed_parts: list[DataFrame] = []
    while True:
        srcs = edges.select(*g, F.col("src").alias("node_id")).distinct()
        dsts = edges.select(*g, F.col("dst").alias("node_id")).distinct()
        keep = _ckpt(srcs.intersect(dsts))
        trimmed = _ckpt(nodes.join(keep, on=g + ["node_id"], how="left_anti"))
        if trimmed.isEmpty():
            acc = trimmed.limit(0)
            for part in trimmed_parts:
                acc = acc.unionByName(part)
            return edges, nodes, acc
        trimmed_parts.append(trimmed)
        nodes = keep
        edges = _ckpt(
            edges.join(
                keep.withColumnRenamed("node_id", "src"), on=g + ["src"]
            ).join(
                keep.withColumnRenamed("node_id", "dst"), on=g + ["dst"]
            ).select(*g, "src", "dst")
        )


def strongly_connected_components(
    graph: LinkGraph,
    *,
    max_rounds: int = 20,
    max_iterations: int = 100,
    join_hint: str | None = None,
) -> DataFrame:
    """Per-node SCC labels: ``[graph_id?, node_id, scc_id]`` where
    ``scc_id`` is the smallest member id of the component."""
    g = gcols(graph.edges)
    edges = _ckpt(
        graph.edges.select(*g, "src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = _ckpt(
        edges.select(*g, F.col("src").alias("node_id"))
        .union(edges.select(*g, F.col("dst").alias("node_id")))
        .distinct()
    )
    labeled: list[DataFrame] = []

    for _round in range(max_rounds):
        edges, nodes, trimmed = _trim(edges, nodes, g)
        if not trimmed.isEmpty():
            labeled.append(
                trimmed.select(
                    *g, "node_id", F.col("node_id").alias("scc_id")
                )
            )
        if nodes.isEmpty():
            break

        # forward max-coloring
        colors0 = nodes.withColumn("color", F.col("node_id"))

        def color_step(state: DataFrame, superstep: int) -> DataFrame:
            fwd = edges.join(
                hinted(state.withColumnRenamed("node_id", "src"), join_hint),
                on=g + ["src"],
            ).select(*g, F.col("dst").alias("node_id"), "color")
            return (
                state.select(*g, "node_id", "color")
                .union(fwd)
                .groupBy(*g, "node_id")
                .agg(F.max("color").alias("color"))
            )

        def color_converged(prev: DataFrame, new: DataFrame):
            # colors are monotone non-decreasing; decimal sum is
            # ANSI-safe for full-range 64-bit ids
            s = new.agg(
                F.sum(F.col("color").cast("decimal(38,0)"))
            ).first()[0]
            p = prev.agg(
                F.sum(F.col("color").cast("decimal(38,0)"))
            ).first()[0]
            return s == p, {"color_sum": str(s)}

        colors, _ = run_fixpoint(
            colors0, color_step, converged=color_converged,
            max_iterations=max_iterations,
        )

        # backward containment within each color class
        ecol = _ckpt(
            edges.join(
                colors.withColumnRenamed("node_id", "src")
                .withColumnRenamed("color", "src_color"),
                on=g + ["src"],
            ).join(
                colors.withColumnRenamed("node_id", "dst")
                .withColumnRenamed("color", "dst_color"),
                on=g + ["dst"],
            ).where(F.col("src_color") == F.col("dst_color"))
            .select(*g, "src", "dst")
        )
        reached0 = colors.where(F.col("color") == F.col("node_id")).select(
            *g, "node_id", "color"
        )

        def back_step(state: DataFrame, superstep: int) -> DataFrame:
            # state: nodes known to reach their color root within the
            # class.  ecol only keeps same-color edges, so the carried
            # color always equals the node's own color — no re-check.
            back = ecol.join(
                hinted(state.withColumnRenamed("node_id", "dst"), join_hint),
                on=g + ["dst"],
            ).select(*g, F.col("src").alias("node_id"), "color")
            return state.select(*g, "node_id", "color").union(back).distinct()

        def back_converged(prev: DataFrame, new: DataFrame):
            n = new.count()
            return n == prev.count(), {"reached": int(n)}

        reached, _ = run_fixpoint(
            reached0, back_step, converged=back_converged,
            max_iterations=max_iterations,
        )

        scc_min = reached.groupBy(*g, "color").agg(
            F.min("node_id").alias("scc_id")
        )
        members = _ckpt(
            reached.join(scc_min, on=g + ["color"]).select(
                *g, "node_id", "scc_id"
            )
        )
        labeled.append(members)

        nodes = _ckpt(
            nodes.join(
                members.select(*g, "node_id"), on=g + ["node_id"],
                how="left_anti",
            )
        )
        if nodes.isEmpty():
            break
        edges = _ckpt(
            edges.join(
                nodes.withColumnRenamed("node_id", "src"), on=g + ["src"]
            ).join(
                nodes.withColumnRenamed("node_id", "dst"), on=g + ["dst"]
            ).select(*g, "src", "dst")
        )

    if not nodes.isEmpty():
        raise RuntimeError(
            f"SCC did not converge within max_rounds={max_rounds}; "
            "raise max_rounds (each round peels at least one SCC per "
            "color class, so pathological chains of interlocking SCCs "
            "need more rounds)"
        )
    all_nodes = graph.nodes().select(*g, "node_id")
    if not labeled:
        # edgeless (or self-loop-only) graph: every node is a singleton
        return all_nodes.select(*g, "node_id", F.col("node_id").alias("scc_id"))
    out = labeled[0]
    for part in labeled[1:]:
        out = out.unionByName(part)
    # nodes appearing only in self-loops were dropped with src != dst;
    # restore every graph node as its own singleton if missing
    missing = all_nodes.join(
        out.select(*g, "node_id"), on=g + ["node_id"], how="left_anti"
    ).select(*g, "node_id", F.col("node_id").alias("scc_id"))
    return out.unionByName(missing)


def bow_tie(
    graph: LinkGraph,
    *,
    join_hint: str | None = None,
    max_iterations: int = 200,
) -> DataFrame:
    """Bow-tie regions relative to the largest SCC:
    ``[graph_id?, node_id, region]`` with region ∈ {'core', 'in',
    'out', 'other'} (Broder et al. 2000; tendrils/tubes/disconnected
    are collapsed into 'other').

    in  = reaches the core but is not in it;
    out = reached from the core but not in it.
    Reachability is two label-spread fixpoints (forward and backward
    from the core), each the same one-join-one-agg superstep shape as
    hash-min CC.
    """
    g = gcols(graph.edges)
    scc = strongly_connected_components(graph, join_hint=join_hint)
    sizes = scc.groupBy(*g, "scc_id").agg(F.count(F.lit(1)).alias("n"))
    if g:
        from pyspark.sql import Window

        w = Window.partitionBy(*g).orderBy(F.desc("n"), F.asc("scc_id"))
        core_ids = sizes.withColumn("rk", F.row_number().over(w)).where(
            F.col("rk") == 1
        ).select(*g, "scc_id")
    else:
        core_ids = sizes.orderBy(F.desc("n"), F.asc("scc_id")).limit(1).select(
            "scc_id"
        )
    core = _ckpt(scc.join(core_ids, on=g + ["scc_id"]).select(*g, "node_id"))
    edges = _ckpt(graph.edges.select(*g, "src", "dst").distinct())

    def spread(from_core: DataFrame, reverse: bool) -> DataFrame:
        a, b = ("dst", "src") if reverse else ("src", "dst")
        state0 = from_core.withColumn("hit", F.lit(True))

        def step(st: DataFrame, i: int) -> DataFrame:
            nxt = edges.join(
                hinted(st.withColumnRenamed("node_id", a), join_hint),
                on=g + [a],
            ).select(*g, F.col(b).alias("node_id"), "hit")
            return st.select(*g, "node_id", "hit").union(nxt).distinct()

        def conv(prev: DataFrame, new: DataFrame):
            n = new.count()
            return n == prev.count(), {"reached": int(n)}

        # run_fixpoint returns the partial frontier silently on budget
        # exhaustion — a chain longer than max_iterations hops from the
        # core would mislabel its tail 'other'; the budget is exposed
        # so callers with deep crawl-frontier chains can raise it
        out, _ = run_fixpoint(state0, step, converged=conv,
                              max_iterations=max_iterations)
        return out

    fwd = spread(core, reverse=False).select(*g, "node_id").distinct()
    bwd = spread(core, reverse=True).select(*g, "node_id").distinct()
    nodes = graph.nodes().select(*g, "node_id")
    return (
        nodes.join(core.withColumn("c", F.lit(1)), on=g + ["node_id"], how="left")
        .join(
            fwd.withColumn("f", F.lit(1)), on=g + ["node_id"], how="left"
        )
        .join(
            bwd.withColumn("b", F.lit(1)), on=g + ["node_id"], how="left"
        )
        .select(
            *g,
            "node_id",
            F.when(F.col("c") == 1, F.lit("core"))
            .when(F.col("b") == 1, F.lit("in"))
            .when(F.col("f") == 1, F.lit("out"))
            .otherwise(F.lit("other"))
            .alias("region"),
        )
    )


def condensation_levels(graph: LinkGraph, *, max_rounds: int = 64) -> DataFrame:
    """Topological levels of the SCC condensation DAG:
    ``[scc_id, level]`` where level = longest path from any source
    component (level 0 = no in-edges) — the dependency layering of a
    directed graph after cycle collapse.

    Monotone integer (max, +1) relaxation over the condensation edge
    table; converges in longest-path-length rounds and every
    intermediate state is exact, so the DuckDB oracle's recursive
    longest-path agrees whenever ``max_rounds`` ≥ DAG depth.
    """
    from dachshund_spark.util import gcols

    assert not gcols(graph.edges), "condensation_levels expects a single graph"
    scc = strongly_connected_components(graph)
    e = graph.edges.select("src", "dst").distinct()
    ce = (
        e.join(scc.select(F.col("node_id").alias("src"), F.col("scc_id").alias("_cs")), on="src")
        .join(scc.select(F.col("node_id").alias("dst"), F.col("scc_id").alias("_cd")), on="dst")
        .where(F.col("_cs") != F.col("_cd"))
        .select(F.col("_cs").alias("c_src"), F.col("_cd").alias("c_dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    state = (
        scc.select("scc_id")
        .distinct()
        .withColumn("level", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    for _ in range(int(max_rounds)):
        cand = (
            ce.join(state, ce.c_src == state.scc_id)
            .groupBy(F.col("c_dst").alias("scc_id"))
            .agg((F.max("level") + 1).alias("_cand"))
        )
        new = (
            state.join(cand, on="scc_id", how="left")
            .select(
                "scc_id",
                F.greatest(
                    "level", F.coalesce("_cand", F.lit(0).cast("long"))
                ).alias("level"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(state.alias("o"), on="scc_id")
            .where(F.col("n.level") != F.col("o.level"))
            .count()
        )
        state = new
        if changed == 0:
            break
    return state


def dag_path_counts(graph: LinkGraph, *, max_rounds: int = 64) -> DataFrame:
    """Exact source-to-component path counts on the SCC condensation
    DAG: ``[scc_id, path_count]`` — the number of distinct directed
    paths from ANY source component (no in-edges; its own count is 1)
    to each component.

    The dependency-fan-in census of a link graph after cycle collapse:
    a page whose component has path_count k is reachable along k
    distinct dependency chains.  Fixpoint ``p(v) = 1 if source else
    Σ_{u→v} p(u)`` — a monotone-free synchronous relaxation that
    stabilizes level by level, exact after DAG-depth rounds, and every
    round is one condensation-edges join + one sum (the
    :func:`condensation_levels` shape with (+, Σ) in place of
    (max, +1)).  Counts are BIGINT under ANSI mode: a DAG with more
    than 2^63 paths raises rather than silently wrapping.
    """
    from dachshund_spark.util import gcols

    assert not gcols(graph.edges), "dag_path_counts expects a single graph"
    scc = strongly_connected_components(graph)
    e = graph.edges.select("src", "dst").distinct()
    ce = (
        e.join(scc.select(F.col("node_id").alias("src"), F.col("scc_id").alias("_cs")), on="src")
        .join(scc.select(F.col("node_id").alias("dst"), F.col("scc_id").alias("_cd")), on="dst")
        .where(F.col("_cs") != F.col("_cd"))
        .select(F.col("_cs").alias("c_src"), F.col("_cd").alias("c_dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    comps = scc.select("scc_id").distinct()
    sinks = ce.select(F.col("c_dst").alias("scc_id")).distinct()
    sources = comps.join(sinks, on="scc_id", how="left_anti")
    state = (
        comps.join(sources.withColumn("_is_src", F.lit(1)), on="scc_id", how="left")
        .select(
            "scc_id",
            F.coalesce("_is_src", F.lit(0)).cast("long").alias("_src"),
            F.coalesce("_is_src", F.lit(0)).cast("long").alias("path_count"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(int(max_rounds)):
        cand = (
            ce.join(state, ce.c_src == state.scc_id)
            .groupBy(F.col("c_dst").alias("scc_id"))
            .agg(F.sum("path_count").cast("long").alias("_cand"))
        )
        new = (
            state.join(cand, on="scc_id", how="left")
            .select(
                "scc_id",
                "_src",
                F.when(F.col("_src") == 1, F.lit(1).cast("long"))
                .otherwise(F.coalesce("_cand", F.lit(0).cast("long")))
                .alias("path_count"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(state.alias("o"), on="scc_id")
            .where(F.col("n.path_count") != F.col("o.path_count"))
            .count()
        )
        state = new
        if changed == 0:
            break
    return state.select("scc_id", "path_count")
