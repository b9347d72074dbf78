"""Neighborhood function / effective diameter via HyperBall.

The neighborhood function N(t) = |{(u, v) : d(u, v) <= t}| is the
standard whole-graph distance summary for web graphs (avg distance,
effective diameter).  Dachshund exposes pairwise shortest paths only
(/root/reference/src/dachshund/algorithms/shortest_paths.rs:14-76) —
all-pairs summaries at 10^12-page scale need the sketch formulation:

HyperBall (Boldi & Vigna, "In-Core Computation of Geometric
Centralities with HyperBall", 2013): every node keeps an HLL sketch of
its ball B(v, t); one superstep unions each node's sketch with its
out-neighbors' sketches, so B(v, t+1) = B(v, t) ∪ ⋃_{v→w} B(w, t),
and N(t) = Σ_v |B(v, t)| falls out of the per-superstep estimates.

Spark-first mapping (scale notes):
- sketches are Spark 4's native DataSketches HLL columns
  (``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``) —
  JVM-side typed aggregates with map-side partial merge, never Python;
- one superstep = one edges-side equi-join + one union + one
  ``hll_union_agg`` groupBy — exactly one shuffle, partial-aggregated,
  hub-safe (a hub's incoming sketches pre-merge on the map side);
- per-node state is one sketch of at most 2^lg_k registers, so
  executor memory is bounded and independent of ball size — the whole
  point vs the exact formulation, whose state is O(Σ|B(v,t)|) pairs;
- convergence = total estimate unchanged (register unions are
  monotone), checked on materialized frames only.

``neighborhood_function_exact`` is the fixture-scale twin (distinct
(node, member) pair expansion — state grows to N(∞) rows, only for
oracles/tests) and backs the DuckDB oracle; the sketch path is pinned
to it in tests (DataSketches HLL is exact in sparse mode at fixture
sizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, Window, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.iterate import run_fixpoint
from dachshund_spark.util import gcols, hinted


def _edges(graph: LinkGraph, directed: bool) -> DataFrame:
    return graph.edges if directed else graph.undirected_edges()


def _nf_frame(graph: LinkGraph, rows: list[Row]) -> DataFrame:
    g = graph.grouping
    spark = graph.edges.sparkSession
    out = spark.createDataFrame(
        rows, (["graph_id"] if g else []) + ["distance", "n_pairs"]
    )
    return out.select(
        *g,
        F.col("distance").cast("int").alias("distance"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
    )


def _run_nf(
    graph: LinkGraph,
    state: DataFrame,
    step,
    totals,
    max_distance: int,
) -> DataFrame:
    """Shared fixpoint driver: track per-graph N(t), emit a row only
    while that graph's ball total is still growing (per-graph curves
    end at per-graph convergence), stop globally when nothing grew."""
    g = graph.grouping
    nf_rows: list[Row] = []

    def snapshot(st: DataFrame) -> dict:
        return {tuple(r[c] for c in g): r["n_pairs"] for r in totals(st)}

    prev = snapshot(state)
    for key, n in sorted(prev.items()):
        nf_rows.append(Row(*key, 0, n))
    superstep = [0]

    def converged(prev_st: DataFrame, new_st: DataFrame) -> tuple[bool, dict]:
        nonlocal prev
        cur = snapshot(new_st)
        done = cur == prev
        if not done:
            superstep[0] += 1
            for key, n in sorted(cur.items()):
                if prev.get(key) != n:
                    nf_rows.append(Row(*key, superstep[0], n))
        prev = cur
        return done, {"n_pairs_total": int(sum(cur.values()))}

    run_fixpoint(state, step, converged=converged, max_iterations=max_distance)
    return _nf_frame(graph, nf_rows)


def neighborhood_function(
    graph: LinkGraph,
    *,
    max_distance: int = 50,
    lg_k: int = 12,
    directed: bool = False,
    join_hint: str | None = None,
) -> DataFrame:
    """HyperBall N(t) estimates: ``[graph_id?, distance, n_pairs]``.

    One row per (graph, t) for t = 0..that graph's convergence (ball
    estimate stops growing) or ``max_distance``.  ``lg_k`` is the
    DataSketches log2 register count (12 → ~1.6% relative standard
    error, 4 KiB max per node).
    """
    g = graph.grouping
    edges = _edges(graph, directed)

    state = graph.nodes().groupBy(*g, "node_id").agg(
        F.hll_sketch_agg("node_id", F.lit(lg_k)).alias("sk")
    )

    def step(st: DataFrame, i: int) -> DataFrame:
        nbr = edges.join(
            hinted(st.withColumnRenamed("node_id", "dst"), join_hint),
            on=g + ["dst"],
        ).select(*g, F.col("src").alias("node_id"), "sk")
        unioned = st.select(*g, "node_id", "sk").unionByName(nbr)
        return unioned.groupBy(*g, "node_id").agg(
            F.hll_union_agg("sk").alias("sk")
        )

    def totals(st: DataFrame) -> list[Row]:
        return (
            st.groupBy(*g)
            .agg(F.sum(F.hll_sketch_estimate("sk")).alias("n_pairs"))
            .collect()
        )

    return _run_nf(graph, state, step, totals, max_distance)


def neighborhood_function_exact(
    graph: LinkGraph,
    *,
    max_distance: int = 50,
    directed: bool = False,
) -> DataFrame:
    """Exact N(t) via distinct (node, member) expansion.

    State is the full ball membership — O(N(∞)) rows — so this is the
    fixture-scale twin for oracles and tests, not the 100-TB path.
    """
    g = graph.grouping
    edges = _edges(graph, directed)
    state = graph.nodes().select(*g, "node_id", F.col("node_id").alias("member"))

    def step(st: DataFrame, i: int) -> DataFrame:
        grown = edges.join(
            st.withColumnRenamed("node_id", "dst"), on=g + ["dst"]
        ).select(*g, F.col("src").alias("node_id"), "member")
        return st.unionByName(grown).distinct()

    def totals(st: DataFrame) -> list[Row]:
        return st.groupBy(*g).agg(F.count(F.lit(1)).alias("n_pairs")).collect()

    return _run_nf(graph, state, step, totals, max_distance)


def harmonic_centrality(
    graph: LinkGraph,
    *,
    max_distance: int = 50,
    lg_k: int = 12,
    directed: bool = False,
    join_hint: str | None = None,
) -> DataFrame:
    """HyperBall per-node harmonic centrality + ball-size estimates.

    harmonic(v) = Σ_{u≠v} 1/d(v,u) falls out of the per-superstep ball
    deltas: Σ_t (|B(v,t)| − |B(v,t−1)|)/t (Boldi & Vigna 2013, §3 —
    the geometric-centrality payoff of HyperBall).  Returns
    ``[graph_id?, node_id, ball_size, harmonic]``.

    The superstep is the NF superstep plus two column expressions: the
    neighbor rows carry null (est, harm) so the groupBy folds state
    and messages in the same single shuffle — no second join.
    """
    g = graph.grouping
    edges = _edges(graph, directed)

    state = (
        graph.nodes()
        .groupBy(*g, "node_id")
        .agg(F.hll_sketch_agg("node_id", F.lit(lg_k)).alias("sk"))
        .select(
            *g,
            "node_id",
            "sk",
            F.hll_sketch_estimate("sk").alias("est"),
            F.lit(0.0).alias("harm"),
        )
    )

    def step(st: DataFrame, i: int) -> DataFrame:
        nbr = edges.join(
            hinted(st.withColumnRenamed("node_id", "dst"), join_hint),
            on=g + ["dst"],
        ).select(
            *g,
            F.col("src").alias("node_id"),
            "sk",
            F.lit(None).cast("long").alias("est"),
            F.lit(None).cast("double").alias("harm"),
        )
        unioned = st.select(*g, "node_id", "sk", "est", "harm").unionByName(nbr)
        merged = unioned.groupBy(*g, "node_id").agg(
            F.hll_union_agg("sk").alias("sk"),
            F.max("est").alias("est"),
            F.max("harm").alias("harm"),
        )
        new_est = F.hll_sketch_estimate("sk")
        return merged.select(
            *g,
            "node_id",
            "sk",
            new_est.alias("new_est"),
            (
                F.col("harm")
                + (new_est - F.col("est")) / F.lit(i + 1).cast("double")
            ).alias("harm"),
        ).withColumnRenamed("new_est", "est")

    def converged(prev_st: DataFrame, new_st: DataFrame) -> tuple[bool, dict]:
        tot = new_st.groupBy(*g).agg(F.sum("est").alias("s")).collect()
        cur = {tuple(r[c] for c in g): r["s"] for r in tot}
        done = cur == getattr(converged, "prev", None)
        converged.prev = cur
        return done, {"ball_total": int(sum(cur.values()))}

    final, _ = run_fixpoint(
        state, step, converged=converged, max_iterations=max_distance
    )
    return final.select(
        *g,
        "node_id",
        F.col("est").cast("long").alias("ball_size"),
        F.col("harm").cast("double").alias("harmonic"),
    )


def harmonic_centrality_exact(
    graph: LinkGraph,
    *,
    max_distance: int = 50,
    directed: bool = False,
) -> DataFrame:
    """Exact per-node distance aggregates via first-seen ball expansion.

    State is every (node, member, dist) triple — fixture-scale twin for
    oracles/tests.  Returns ``[graph_id?, node_id, reachable, harmonic,
    closeness]`` with harmonic(v) = Σ 1/d summed per distance level
    (count(d)/d — the same per-level accumulation as the HyperBall
    path, so the two agree to float round-off) and closeness(v) =
    (reachable − 1)/Σd (0.0 for isolated balls).
    """
    g = graph.grouping
    edges = _edges(graph, directed)
    state = graph.nodes().select(
        *g, "node_id", F.col("node_id").alias("member"), F.lit(0).alias("dist")
    )

    def step(st: DataFrame, i: int) -> DataFrame:
        grown = edges.join(
            st.withColumnRenamed("node_id", "dst"), on=g + ["dst"]
        ).select(
            *g,
            F.col("src").alias("node_id"),
            "member",
            (F.col("dist") + 1).alias("dist"),
        )
        return (
            st.unionByName(grown)
            .groupBy(*g, "node_id", "member")
            .agg(F.min("dist").alias("dist"))
        )

    def converged(prev_st: DataFrame, new_st: DataFrame) -> tuple[bool, dict]:
        n = new_st.count()
        done = n == getattr(converged, "prev", None)
        converged.prev = n
        return done, {"pairs": int(n)}

    final, _ = run_fixpoint(
        state, step, converged=converged, max_iterations=max_distance
    )
    per_level = final.where(F.col("dist") > 0).groupBy(*g, "node_id", "dist").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    agg = per_level.groupBy(*g, "node_id").agg(
        (F.sum("cnt") + 1).alias("reachable"),
        F.sum(F.col("cnt") / F.col("dist").cast("double")).alias("harmonic"),
        F.sum(F.col("cnt") * F.col("dist")).alias("dist_sum"),
    )
    # isolated nodes never appear in per_level — restore them
    base = graph.nodes().select(*g, "node_id")
    out = base.join(agg, on=g + ["node_id"], how="left")
    return out.select(
        *g,
        "node_id",
        F.coalesce("reachable", F.lit(1)).cast("long").alias("reachable"),
        F.coalesce("harmonic", F.lit(0.0)).cast("double").alias("harmonic"),
        F.when(
            F.coalesce("dist_sum", F.lit(0)) == 0, F.lit(0.0)
        ).otherwise(
            (F.coalesce("reachable", F.lit(1)) - 1)
            / F.col("dist_sum").cast("double")
        ).cast("double").alias("closeness"),
    )


def distance_summary(nf: DataFrame, *, alpha: float = 0.9) -> DataFrame:
    """Per-graph distance metrics from a neighborhood-function frame.

    Returns ``[graph_id?, avg_distance, effective_diameter,
    reachable_pairs]`` where:

    - ``avg_distance`` = Σ_t t·(N(t) − N(t−1)) / (N(∞) − N(0)) — the
      mean over reachable ordered pairs at distance ≥ 1;
    - ``effective_diameter`` = the smallest t with N(t) ≥ α·N(∞),
      linearly interpolated between t−1 and t (HyperBall convention);
    - ``reachable_pairs`` = N(∞) (including the N(0) self-pairs).
    """
    g = [c for c in nf.columns if c == "graph_id"]
    w = nf.select(
        *g,
        "distance",
        "n_pairs",
        F.lag("n_pairs")
        .over(Window.partitionBy(*g).orderBy("distance"))
        .alias("prev_pairs"),
    )
    new_pairs = F.col("n_pairs") - F.coalesce(F.col("prev_pairs"), F.lit(0))
    per_t = w.select(
        *g,
        "distance",
        "n_pairs",
        F.when(F.col("prev_pairs").isNull(), F.lit(0)).otherwise(new_pairs).alias(
            "new_pairs"
        ),
    )
    # single-graph frames join on a constant key so every branch below
    # is one code path (and a missing "before" row stays a left-join null)
    key = g or ["_k"]
    if not g:
        per_t = per_t.withColumn("_k", F.lit(1))
    tot = per_t.groupBy(*key).agg(
        F.max("n_pairs").alias("n_inf"),
        F.min(F.when(F.col("distance") == 0, F.col("n_pairs"))).alias("n0"),
        F.sum(F.col("distance") * F.col("new_pairs")).alias("dist_sum"),
    )
    # one row per graph on the right side — broadcast explicitly: on
    # single-graph frames the join key is the folded constant _k and
    # Catalyst otherwise degenerates these to CartesianProduct
    joined = per_t.join(F.broadcast(tot), on=key)
    # interpolated effective diameter: first t with N(t) >= alpha*n_inf
    hit = joined.where(F.col("n_pairs") >= F.lit(alpha) * F.col("n_inf"))
    first_hit = hit.groupBy(*key).agg(F.min("distance").alias("t_hit"))
    interp = joined.join(F.broadcast(first_hit), on=key)
    at_hit = interp.where(F.col("distance") == F.col("t_hit")).select(
        *key, "t_hit", F.col("n_pairs").alias("n_hit"), "n_inf", "n0", "dist_sum"
    )
    before = interp.where(F.col("distance") == F.col("t_hit") - 1).select(
        *key, F.col("n_pairs").alias("n_before")
    )
    out = at_hit.join(F.broadcast(before), on=key, how="left")
    if not g:
        out = out.drop("_k")
    eff = F.when(
        F.col("n_before").isNull() | (F.col("n_hit") == F.col("n_before")),
        F.col("t_hit").cast("double"),
    ).otherwise(
        F.col("t_hit") - 1
        + (F.lit(alpha) * F.col("n_inf") - F.col("n_before"))
        / (F.col("n_hit") - F.col("n_before"))
    )
    avg = F.when(F.col("n_inf") == F.col("n0"), F.lit(0.0)).otherwise(
        F.col("dist_sum") / (F.col("n_inf") - F.col("n0"))
    )
    return out.select(
        *g,
        avg.cast("double").alias("avg_distance"),
        eff.cast("double").alias("effective_diameter"),
        F.col("n_inf").cast("long").alias("reachable_pairs"),
    )


def ego_networks(
    graph: LinkGraph,
    seeds: list[int],
    radius: int = 2,
    *,
    directed: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Radius-``radius`` ego networks around each seed, all seeds in ONE
    multi-source BFS: returns ``(members, edges)`` where members =
    [g?, seed, node_id, dist] (dist ≤ radius) and edges = [g?, seed,
    src, dst], the edges induced on each seed's member set.

    The site-neighborhood extraction primitive (pull a domain's 2-hop
    web context for inspection / labeling / subgraph mining).  All
    seeds advance together — superstep s holds every (seed, frontier
    node) pair, so the cost is one join per hop regardless of seed
    count, not |seeds| sequential BFS jobs.  Frontier rows are keyed
    (seed, node): overlapping ego nets dedupe per seed, not globally.
    Induced-edge extraction is two semi-joins of the member table
    against the edge table.
    """
    e = _edges(graph, directed)
    g = gcols(e)
    if not seeds:
        raise ValueError("seeds must be non-empty")
    spark = e.sparkSession
    seed_df = spark.createDataFrame(
        [(int(s),) for s in sorted(set(seeds))], "seed long"
    )
    if g:
        seed_df = e.select(*g).distinct().crossJoin(seed_df)
    # only seeds that exist in the graph start a frontier
    nodes = e.select(*g, F.col("src").alias("node_id")).union(
        e.select(*g, F.col("dst").alias("node_id"))
    ).distinct()
    members = seed_df.join(
        nodes.withColumnRenamed("node_id", "seed"), on=g + ["seed"]
    ).select(*g, "seed", F.col("seed").alias("node_id"), F.lit(0).alias("dist"))
    members = members.localCheckpoint(eager=True)
    frontier = members
    for d in range(1, radius + 1):
        nxt = (
            frontier.join(
                e.withColumnRenamed("src", "node_id"), on=g + ["node_id"]
            )
            .select(*g, "seed", F.col("dst").alias("node_id"))
            .distinct()
            .join(members.select(*g, "seed", "node_id"), on=g + ["seed", "node_id"], how="left_anti")
            .withColumn("dist", F.lit(d))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        members = members.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    m = members.select(*g, "seed", "node_id")
    ego_edges = (
        e.join(m.withColumnRenamed("node_id", "src"), on=g + ["src"])
        .join(m.withColumnRenamed("node_id", "dst"), on=g + ["seed", "dst"])
        .select(*g, "seed", "src", "dst")
    )
    return members, ego_edges


def landmark_distances(
    graph: LinkGraph,
    landmarks: list[int],
    max_distance: int = 16,
    *,
    directed: bool = False,
) -> DataFrame:
    """BFS distances from every landmark: ``[g?, landmark, node_id,
    dist]`` (unreached nodes absent).  One multi-source BFS for all
    landmarks (see :func:`ego_networks`) — the offline phase of
    landmark-based distance oracles (Potamias et al. CIKM 2009): k
    landmark BFS tables answer any s-t distance query with an
    upper bound in O(k) lookups instead of an online BFS over the
    whole graph."""
    members, _ = ego_networks(
        graph, landmarks, radius=max_distance, directed=directed
    )
    cols = [c for c in members.columns if c not in ("seed", "node_id", "dist")]
    return members.select(
        *cols, F.col("seed").alias("landmark"), "node_id", "dist"
    )


def estimate_distances(
    dists: DataFrame,
    pairs: DataFrame,
    backward_dists: DataFrame | None = None,
) -> DataFrame:
    """Landmark upper-bound distance estimates for query ``pairs``
    [u, v]: ``est_distance = min over landmarks of d(u, l) + d(l, v)``
    — exact when some landmark lies on a shortest path, an upper bound
    otherwise (triangle inequality).  Pairs not co-reachable via any
    landmark are absent.  Two dictionary joins + one min aggregation;
    at query-serving scale the landmark table is the broadcast side.

    For UNDIRECTED landmark tables d(u, l) = d(l, u), so ``dists``
    alone suffices.  For DIRECTED tables ``dists`` holds d(l→x) only —
    pass ``backward_dists`` (built with ``landmark_distances`` on the
    REVERSED graph, i.e. d(x→l)) for the u side, or the "estimate"
    d(l→u) + d(l→v) bounds nothing (two out-neighbors of a landmark
    can be mutually unreachable).
    """
    g = [c for c in dists.columns if c not in ("landmark", "node_id", "dist")]
    u_side = backward_dists if backward_dists is not None else dists
    du = u_side.select(
        *g, "landmark", F.col("node_id").alias("u"), F.col("dist").alias("_du")
    )
    dv = dists.select(
        *g, "landmark", F.col("node_id").alias("v"), F.col("dist").alias("_dv")
    )
    return (
        pairs.join(du, on=g + ["u"])
        .join(dv, on=g + ["landmark", "v"])
        .groupBy(*g, "u", "v")
        .agg(
            F.min(F.col("_du") + F.col("_dv")).cast("int").alias("est_distance")
        )
    )


def effective_diameter(
    graph: LinkGraph,
    *,
    q: float = 0.9,
    max_distance: int = 50,
    directed: bool = False,
    nf: DataFrame | None = None,
) -> DataFrame:
    """``[graph_id?, effective_diameter]`` — the interpolated smallest
    t with N(t) >= q·N(inf) (Palmer et al. 2002 ANF; the standard
    "90% effective diameter" of web-graph papers).

    The curve frame is tiny (<= diameter rows per graph), so the
    per-graph window here is summary-scale, not data-scale.  Pass
    ``nf`` to reuse a precomputed curve — at 100 TB that's the
    HyperBall sketch estimate (same formula over sketched counts);
    the default exact NF is the fixture/oracle twin.

    Float parity contract: target = q·N(inf), one compare, one
    interpolation division — the expression tree matches the DuckDB
    oracle term-for-term (single IEEE ops over exact integers).
    """
    g = graph.grouping
    if nf is None:
        nf = neighborhood_function_exact(
            graph, max_distance=max_distance, directed=directed
        )
    w = (
        Window.partitionBy(*g).orderBy("distance")
        if g
        else Window.orderBy("distance")
    )
    lagged = nf.withColumn("prev", F.lag("n_pairs").over(w))
    mx = nf.groupBy(*g).agg(F.max("n_pairs").alias("nmax"))
    j = lagged.join(mx, on=g) if g else lagged.crossJoin(mx)
    t = j.withColumn("target", F.lit(q) * F.col("nmax").cast("double"))
    hit = (
        t.where(F.col("n_pairs").cast("double") >= F.col("target"))
        .groupBy(*g)
        .agg(
            F.min_by(
                F.struct("distance", "prev", "n_pairs", "target"), "distance"
            ).alias("s")
        )
    )
    return hit.select(
        *g,
        F.when(F.col("s.distance") == 0, F.lit(0.0))
        .otherwise(
            (F.col("s.distance") - 1)
            + (F.col("s.target") - F.col("s.prev").cast("double"))
            / (F.col("s.n_pairs").cast("double") - F.col("s.prev").cast("double"))
        )
        .alias("effective_diameter"),
    )
