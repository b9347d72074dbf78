"""HITS (hubs & authorities) — the directed companion to PageRank.

Kleinberg's recurrence over the directed edge set: auth'(v) = Σ hub(u)
over in-edges u→v, then hub'(v) = Σ auth'(w) over out-edges v→w, each
max-normalized per iteration (same normalization choice as
:mod:`dachshund_spark.algorithms.evcent`, which keeps the oracle SQL a
plain MAX()).  Dachshund has no HITS; the superstep shape is two
edges-side joins + two aggregations, so everything said about bucketed
adjacency and salting for PageRank applies per half-step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.iterate import run_fixpoint
from dachshund_spark.util import gcols


def _max_norm(scores: DataFrame, g: list[str], col: str) -> DataFrame:
    """Divide ``col`` by its per-graph max (broadcast scalar join)."""
    mx = scores.groupBy(*g).agg(F.max(col).alias("_mx"))
    if g:
        scores = scores.join(F.broadcast(mx), on=g)
    else:
        scores = scores.crossJoin(F.broadcast(mx))
    return scores.withColumn(col, F.col(col) / F.col("_mx")).drop("_mx")


def hits(
    graph: LinkGraph,
    *,
    eps: float = 1e-6,
    max_iterations: int = 100,
    fixed_iterations: int | None = None,
    dedupe_edges: bool = True,
) -> DataFrame:
    """[g?, node_id, hub, auth] — both vectors max-normalized (top hub
    and top authority are 1.0).  ``fixed_iterations`` pins the
    iteration count for oracle parity."""
    edges = graph.edges.distinct() if dedupe_edges else graph.edges
    edges = edges.persist()
    g = gcols(edges)
    nodes = graph.nodes()
    state0 = nodes.withColumn("hub", F.lit(1.0)).withColumn("auth", F.lit(1.0))

    def _norm_join(scores: DataFrame, col: str) -> DataFrame:
        return _max_norm(scores, g, col)

    def step(state: DataFrame, superstep: int) -> DataFrame:
        auth = (
            edges.join(
                state.select(*g, F.col("node_id").alias("src"), "hub"),
                on=g + ["src"],
            )
            .groupBy(*g, F.col("dst").alias("node_id"))
            .agg(F.sum("hub").alias("auth"))
        )
        auth = _norm_join(auth, "auth")
        hub = (
            edges.join(
                auth.select(*g, F.col("node_id").alias("dst"), "auth"),
                on=g + ["dst"],
            )
            .groupBy(*g, F.col("src").alias("node_id"))
            .agg(F.sum("auth").alias("hub"))
        )
        hub = _norm_join(hub, "hub")
        return (
            state.select(*g, "node_id")
            .join(hub, on=g + ["node_id"], how="left")
            .join(auth, on=g + ["node_id"], how="left")
            .select(
                *g,
                "node_id",
                F.coalesce("hub", F.lit(0.0)).alias("hub"),
                F.coalesce("auth", F.lit(0.0)).alias("auth"),
            )
        )

    if fixed_iterations is not None:
        converged = None
        budget = fixed_iterations
    else:
        budget = max_iterations

        def converged(prev: DataFrame, new: DataFrame) -> tuple[bool, dict]:
            diff = (
                new.join(
                    prev.select(
                        *g, "node_id",
                        F.col("hub").alias("ph"), F.col("auth").alias("pa"),
                    ),
                    on=g + ["node_id"],
                )
                .agg(
                    F.sum(
                        F.abs(F.col("hub") - F.col("ph"))
                        + F.abs(F.col("auth") - F.col("pa"))
                    )
                )
                .first()[0]
            )
            return diff is not None and diff <= eps, {"l1_diff": float(diff or 0.0)}

    final, _ = run_fixpoint(state0, step, converged=converged, max_iterations=budget)
    edges.unpersist()
    return final


def salsa(
    graph: LinkGraph,
    *,
    eps: float = 1e-6,
    max_iterations: int = 100,
    fixed_iterations: int | None = None,
    dedupe_edges: bool = True,
) -> DataFrame:
    """SALSA (Lempel & Moran 2000): HITS with degree-normalized
    contributions — auth'(v) = Σ_{u→v} hub(u)/out(u), then
    hub'(u) = Σ_{u→v} auth'(v)/in(v).  Each half-step is
    max-normalized (same output convention as :func:`hits`, which
    keeps the unrolled oracle a plain ``MAX()``); the degree
    normalization is what damps HITS's tightly-knit-community bias,
    which is why SALSA is the standard link-analysis scorer for
    who-to-crawl / who-to-follow systems.

    Returns ``[g?, node_id, hub, auth]``.  Scale shape is identical to
    :func:`hits` — two edges-side joins + two aggregations per
    superstep — except both degree normalizers are folded into the
    static edge table *before* the loop, so no per-superstep degree
    join is added.
    """
    edges = graph.edges.distinct() if dedupe_edges else graph.edges
    g = gcols(edges)
    od = edges.groupBy(*g, "src").agg(F.count(F.lit(1)).alias("_od"))
    idg = edges.groupBy(*g, "dst").agg(F.count(F.lit(1)).alias("_id"))
    edges = (
        edges.join(od, on=g + ["src"])
        .join(idg, on=g + ["dst"])
        .persist()
    )
    nodes = graph.nodes()
    state0 = nodes.withColumn("hub", F.lit(1.0)).withColumn("auth", F.lit(1.0))

    def step(state: DataFrame, superstep: int) -> DataFrame:
        auth = (
            edges.join(
                state.select(*g, F.col("node_id").alias("src"), "hub"),
                on=g + ["src"],
            )
            .groupBy(*g, F.col("dst").alias("node_id"))
            .agg(F.sum(F.col("hub") / F.col("_od")).alias("auth"))
        )
        auth = _max_norm(auth, g, "auth")
        hub = (
            edges.join(
                auth.select(*g, F.col("node_id").alias("dst"), "auth"),
                on=g + ["dst"],
            )
            .groupBy(*g, F.col("src").alias("node_id"))
            .agg(F.sum(F.col("auth") / F.col("_id")).alias("hub"))
        )
        hub = _max_norm(hub, g, "hub")
        return (
            state.select(*g, "node_id")
            .join(hub, on=g + ["node_id"], how="left")
            .join(auth, on=g + ["node_id"], how="left")
            .select(
                *g,
                "node_id",
                F.coalesce("hub", F.lit(0.0)).alias("hub"),
                F.coalesce("auth", F.lit(0.0)).alias("auth"),
            )
        )

    if fixed_iterations is not None:
        converged = None
        budget = fixed_iterations
    else:
        budget = max_iterations

        def converged(prev: DataFrame, new: DataFrame) -> tuple[bool, dict]:
            diff = (
                new.join(
                    prev.select(
                        *g, "node_id",
                        F.col("hub").alias("ph"), F.col("auth").alias("pa"),
                    ),
                    on=g + ["node_id"],
                )
                .agg(
                    F.sum(
                        F.abs(F.col("hub") - F.col("ph"))
                        + F.abs(F.col("auth") - F.col("pa"))
                    )
                )
                .first()[0]
            )
            return diff is not None and diff <= eps, {"l1_diff": float(diff or 0.0)}

    final, _ = run_fixpoint(state0, step, converged=converged, max_iterations=budget)
    edges.unpersist()
    return final


def wtf_recommendations(
    graph: LinkGraph,
    seeds: list[int],
    *,
    circle_size: int = 20,
    salsa_iterations: int = 6,
    top_k: int = 10,
    damping: float = 0.85,
    ppr_iterations: int = 10,
) -> DataFrame:
    """Whom-to-follow recommendations (Gupta et al., WWW 2013 — the
    Twitter WTF architecture): ``[node_id, auth]``, the ``top_k``
    strongest authorities for the seed user(s).

    Pipeline: (1) personalized PageRank from the seed set ranks the
    "circle of trust" — the ``circle_size`` most-trusted accounts;
    (2) SALSA runs on the bipartite graph of circle members (hub side)
    and everyone they follow (authority side); (3) authorities the
    seeds already follow — and the seeds themselves — are filtered
    out, and the rest rank by final SALSA authority.

    Engine-stability: both top-k cuts rank by the e8-integer key
    ``CAST(ROUND(score·1e8) AS LONG)`` with node-id tie-break, so the
    selection replays identically in SQL.  The circle handoff is a
    bounded LIMIT-``circle_size`` collect (driver-safe at any graph
    scale); the SALSA subgraph is the circle's out-edges only — at
    100 TB that is a per-query slice, not a full-graph pass, which is
    what made WTF servable online.
    """
    from dachshund_spark.algorithms.pagerank import pagerank

    pr = pagerank(
        graph,
        damping=damping,
        fixed_iterations=ppr_iterations,
        personalization=list(seeds),
    )
    key = F.round(F.col("pagerank") * F.lit(1e8), 0).cast("long")
    circle = [
        r[0]
        for r in pr.select("node_id", key.alias("_k"))
        .orderBy(F.desc("_k"), F.asc("node_id"))
        .limit(int(circle_size))
        .collect()
    ]
    sub = LinkGraph(graph.edges.where(F.col("src").isin(circle)))
    sc = salsa(sub, fixed_iterations=salsa_iterations)
    followed = (
        graph.edges.where(F.col("src").isin(list(seeds)))
        .select("dst")
        .distinct()
    )
    akey = F.round(F.col("auth") * F.lit(1e8), 0).cast("long")
    return (
        sc.join(followed, sc.node_id == followed.dst, "left_anti")
        .where(~F.col("node_id").isin(list(seeds)))
        .select("node_id", F.round("auth", 8).alias("auth"), akey.alias("_k"))
        .orderBy(F.desc("_k"), F.asc("node_id"))
        .limit(int(top_k))
        .drop("_k")
    )
