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


def weighted_sssp(
    graph: LinkGraph,
    source: int,
    weight_col: str,
    max_rounds: int = 10_000,
    fixed_rounds: int | None = None,
) -> DataFrame:
    """Single-source shortest paths with non-negative edge weights:
    [g?, node_id, dist] (null dist = unreachable).

    Distributed Bellman-Ford: each round relaxes every edge once —
    ``dist'(v) = min(dist(v), min over in-edges (dist(u) + w))`` — as
    one edges-side join + one min aggregation; after k rounds the
    state holds exact ≤k-hop shortest distances, so ``fixed_rounds``
    is deterministic for oracle parity and the default runs to the
    fixpoint (no round changes any distance).  The reference's
    Dijkstra is unweighted-only (shortest_paths.rs:15-68) — this is
    the weighted extension a link graph with edge costs needs.
    Construct the graph with ``LinkGraph(df, extra_cols=[weight_col])``.
    """
    edges = graph.edges
    if weight_col not in edges.columns:
        raise ValueError(f"edges have no {weight_col!r} column")
    g = gcols(edges)
    nodes = graph.nodes()
    state = nodes.withColumn(
        "dist",
        F.when(F.col("node_id") == source, F.lit(0.0)).cast("double"),
    ).localCheckpoint(eager=True)

    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    for _ in range(rounds):
        relaxed = (
            edges.join(
                state.where(F.col("dist").isNotNull())
                .select(*g, F.col("node_id").alias("src"), "dist"),
                on=g + ["src"],
            )
            .groupBy(*g, F.col("dst").alias("node_id"))
            .agg(F.min(F.col("dist") + F.col(weight_col)).alias("cand"))
        )
        new = (
            state.join(relaxed, on=g + ["node_id"], how="left")
            .select(
                *g,
                "node_id",
                F.least(
                    F.coalesce("dist", F.lit(float("inf"))),
                    F.coalesce("cand", F.lit(float("inf"))),
                ).alias("d2"),
            )
            .select(
                *g,
                "node_id",
                F.when(F.col("d2") != float("inf"), F.col("d2")).alias("dist"),
            )
            .localCheckpoint(eager=True)
        )
        if fixed_rounds is None:
            converged = (
                new.join(
                    state.select(*g, "node_id", F.col("dist").alias("pd")),
                    on=g + ["node_id"],
                )
                .where(
                    (F.col("dist").isNotNull() & F.col("pd").isNull())
                    | (F.col("dist") < F.col("pd"))
                )
                .isEmpty()
            )
            # release the superseded checkpoint — without this every
            # round's full state snapshot stays pinned in storage
            state.unpersist()
            state = new
            if converged:
                break
        else:
            state.unpersist()
            state = new
    return state


def all_distances(graph: LinkGraph, source: int, **kwargs) -> DataFrame:
    """Distances for every node (null for unreachable) — matches the
    reference's Option<u32> map (shortest_paths.rs:15-68)."""
    g = gcols(graph.edges)
    reached = bfs_sssp(graph, source, **kwargs).select(*g, "node_id", "dist")
    return graph.nodes().join(reached, on=g + ["node_id"], how="left")


def double_sweep_diameter(
    graph: LinkGraph, *, source: int = 0, max_depth: int = 10_000
) -> DataFrame:
    """Double-sweep diameter lower bound (Magnien, Latapy & Habib 2009):
    single row ``[source, ecc_source, far_node, diameter_lb, witness]``.

    Sweep 1: BFS from ``source``; its farthest reachable node
    (max dist, ties → min node_id) is ``far_node`` — on real web graphs
    a near-peripheral vertex.  Sweep 2: BFS from ``far_node``; its
    eccentricity is ``diameter_lb`` (≤ true diameter, empirically tight
    on power-law topologies), attained at ``witness``.

    Two distributed BFS fixpoints plus two one-row driver collects (the
    sweeps are inherently sequential — the second source IS the first
    sweep's answer; that scalar handoff is the entire driver traffic).
    Single-graph only: a grouped frame would need a per-graph second
    source, i.e. a join not a literal — callers split by graph first.
    """
    if gcols(graph.edges):
        raise ValueError("double_sweep_diameter is single-graph only")
    d1 = all_distances(graph, source, max_depth=max_depth)
    r1 = (
        d1.where(F.col("dist").isNotNull())
        .orderBy(F.desc("dist"), F.asc("node_id"))
        .first()
    )
    if r1 is None:
        raise ValueError(f"source {source} not in graph")
    far, ecc1 = int(r1["node_id"]), int(r1["dist"])
    d2 = all_distances(graph, far, max_depth=max_depth)
    r2 = (
        d2.where(F.col("dist").isNotNull())
        .orderBy(F.desc("dist"), F.asc("node_id"))
        .first()
    )
    return graph.edges.sparkSession.createDataFrame(
        [(source, ecc1, far, int(r2["dist"]), int(r2["node_id"]))],
        "source long, ecc_source long, far_node long, diameter_lb long, witness long",
    )


def widest_path(
    graph: LinkGraph,
    source: int,
    weight_col: str,
    max_rounds: int = 10_000,
    fixed_rounds: int | None = None,
) -> DataFrame:
    """Single-source widest (maximum-bottleneck) path capacities:
    ``[g?, node_id, capacity]`` — the largest w such that a path from
    ``source`` exists whose minimum edge weight is w. NULL = source
    itself or unreachable.

    Bellman-Ford with (max, min) relaxation instead of (min, +):
    ``cap'(v) = max(cap(v), max over in-edges least(cap(u), w))``.
    Weights stay integer (long) end-to-end, so the monotone state is
    exact after ANY fixed round count — same oracle-determinism
    contract as :func:`weighted_sssp`. The source's internal +∞
    sentinel (2^62) is masked to NULL on output.
    """
    edges = graph.edges
    if weight_col not in edges.columns:
        raise ValueError(f"edges have no {weight_col!r} column")
    g = gcols(edges)
    inf = 1 << 62
    state = graph.nodes().withColumn(
        "cap",
        F.when(F.col("node_id") == source, F.lit(inf)).cast("long"),
    ).localCheckpoint(eager=True)

    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    for _ in range(rounds):
        relaxed = (
            edges.join(
                state.where(F.col("cap").isNotNull())
                .select(*g, F.col("node_id").alias("src"), "cap"),
                on=g + ["src"],
            )
            .groupBy(*g, F.col("dst").alias("node_id"))
            .agg(F.max(F.least(F.col("cap"), F.col(weight_col))).alias("cand"))
        )
        new = (
            state.join(relaxed, on=g + ["node_id"], how="left")
            .select(
                *g,
                "node_id",
                F.when(F.col("cand").isNull(), F.col("cap"))
                .when(F.col("cap").isNull(), F.col("cand"))
                .otherwise(F.greatest("cap", "cand"))
                .alias("cap"),
            )
            .localCheckpoint(eager=True)
        )
        if fixed_rounds is None:
            changed = (
                new.alias("n")
                .join(state.alias("o"), on=g + ["node_id"])
                .where(
                    F.col("n.cap").eqNullSafe(F.col("o.cap")) == F.lit(False)
                )
                .count()
            )
            state = new
            if changed == 0:
                break
        else:
            state = new
    return state.select(
        *g,
        "node_id",
        F.when(F.col("node_id") != source, F.col("cap")).alias("capacity"),
    )


def voronoi_cells(
    graph: LinkGraph,
    *,
    seed_mod: int = 64,
    seed: int = 0,
    max_rounds: int = 10_000,
) -> DataFrame:
    """Graph Voronoi partition around hash-sampled seeds:
    ``[g?, node_id, dist, cell]`` — every node reachable from the seed
    set labelled with its nearest seed (``cell``), ties at equal
    distance broken by smallest seed id.

    Seeds are the nodes whose md5-derived priority ≡ 0 (mod
    ``seed_mod``) — ~n/seed_mod seeds chosen FULLY DISTRIBUTED (no
    collect, no global sort), deterministic across runs/engines/
    partitionings.  This is the Thorup–Zwick / METIS-coarsening style
    clustering primitive: one multi-source BFS carrying a single
    ``(dist, cell)`` state per node, k-independent — unlike the
    per-landmark tables of :func:`~dachshund_spark.algorithms.\
    neighborhood.landmark_distances`, the state never multiplies by
    the seed count, so it scales to millions of seeds at 100 TB.

    Single-label propagation is exact: every predecessor on a
    seed-set-shortest path to v settles at exactly dist(v)−1, and its
    label is itself a min-distance seed for v, so min-over-neighbor
    labels equals the lexicographic (dist, seed) minimum (induction on
    depth).  Each superstep is one edges join + one min aggregation
    (hub-safe partial agg); frontiers are checkpointed per level.
    Nodes unreachable from every seed are absent.
    """
    und = graph.undirected_edges().persist()
    g = gcols(und)
    nodes = graph.nodes()
    pri = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"vor{seed}#"), F.col("node_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    settled = (
        nodes.where(pri % F.lit(int(seed_mod)) == 0)
        .select(
            *g,
            "node_id",
            F.lit(0).cast("long").alias("dist"),
            F.col("node_id").cast("long").alias("cell"),
        )
        .localCheckpoint(eager=True)
    )
    frontier = settled
    depth = 0
    while depth < max_rounds:
        depth += 1
        expanded = (
            und.join(
                frontier.select(*g, F.col("node_id").alias("src"), "cell"),
                on=g + ["src"],
            )
            .select(*g, F.col("dst").alias("node_id"), "cell")
            .join(settled.select(*g, "node_id"), on=g + ["node_id"], how="left_anti")
            .groupBy(*g, "node_id")
            .agg(F.min("cell").alias("cell"))
            .select(
                *g, "node_id", F.lit(depth).cast("long").alias("dist"), "cell"
            )
            .localCheckpoint(eager=True)
        )
        if expanded.isEmpty():
            break
        settled = settled.union(expanded)
        if depth % 5 == 0:
            settled = settled.localCheckpoint(eager=True)
        frontier = expanded
    und.unpersist()
    return settled
