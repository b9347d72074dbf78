"""TrustRank / spam-mass estimation over a link graph.

Gyöngyi, Garcia-Molina & Pedersen, "Combating Web Spam with TrustRank"
(VLDB 2004) and "Link Spam Detection Based on Mass Estimation"
(VLDB 2006): TrustRank is personalized PageRank whose teleport vector
is uniform over a hand-verified trusted seed set; the *relative spam
mass* of a page is the fraction of its PageRank not attributable to
the trusted core, (PR(p) − TR(p)) / PR(p).  Pages with high PageRank
but high spam mass earn their rank from outside the trust
neighborhood — the classic link-spam signal.

Both ranks come from the existing fixpoint machinery
(:func:`dachshund_spark.algorithms.pagerank.pagerank`), so salting,
checkpoint/resume, bucketed-CSR edges, and the superstep stats barrier
all apply unchanged; this module is composition plus one per-row
expression.  The two rank columns are rounded to 8 decimals BEFORE the
ratio so the spam-mass expression is a deterministic function of
oracle-stable inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.util import gcols, hinted


def trust_rank(
    graph: LinkGraph, trusted: list[int], **pagerank_kwargs
) -> DataFrame:
    """Personalized PageRank with the teleport vector restricted to the
    trusted seed set: ``[graph_id?, node_id, trustrank]``."""
    from dachshund_spark.algorithms.pagerank import pagerank

    tr = pagerank(graph, personalization=trusted, **pagerank_kwargs)
    return tr.withColumnRenamed("pagerank", "trustrank")


def spam_mass(
    graph: LinkGraph, trusted: list[int], **pagerank_kwargs
) -> DataFrame:
    """``[graph_id?, node_id, pagerank, trustrank, spam_mass]`` where
    spam_mass = (PR − TR) / PR on the raw ranks, rounded to 8 decimals
    for output (rank columns likewise rounded for display).

    PR is strictly positive (the (1−d)/n teleport floor), so the ratio
    is always defined.  Cost: two independent fixpoints over the same
    cached edge table + one join — the join shuffles on node_id, the
    same key both fixpoints already end on.
    """
    from dachshund_spark.algorithms.pagerank import pagerank

    g = gcols(graph.edges)
    pr = pagerank(graph, **pagerank_kwargs).select(
        *g, "node_id", F.col("pagerank").alias("_pr")
    )
    tr = pagerank(graph, personalization=trusted, **pagerank_kwargs).select(
        *g, "node_id", F.col("pagerank").alias("_tr")
    )
    # the ratio is computed on the RAW ranks (PR's (1-d)/n teleport
    # floor keeps it defined at ANY n); the 8-decimal rounding is
    # display/oracle-stability only — rounding first would zero the
    # floor past ~3e7 nodes and turn the whole low-rank tail into NaN
    return pr.join(tr, on=g + ["node_id"]).select(
        *g,
        "node_id",
        F.round("_pr", 8).alias("pagerank"),
        F.round("_tr", 8).alias("trustrank"),
        F.round(
            (F.col("_pr") - F.col("_tr")) / F.col("_pr"), 8
        ).alias("spam_mass"),
    )


def sybilrank(
    graph: LinkGraph,
    seeds: list[int],
    *,
    rounds: int,
    join_hint: str | None = None,
) -> DataFrame:
    """SybilRank (Cao, Sirivianos, Yang & Pregueiro, NSDI 2012).

    Trust starts uniform on verified-honest ``seeds`` and spreads by
    EARLY-TERMINATED degree-normalized power iteration over the
    undirected graph: T_k(v) = Σ_{u∈N(v)} T_{k-1}(u)/deg(u).  Because
    the walk is stopped after O(log n) rounds (the caller picks
    ``rounds``; ~log2(n) is the paper's choice) instead of run to the
    stationary distribution, trust cannot cross the sparse cut into a
    sybil region — the stationary limit would be ∝ deg and reveal
    nothing.  The ranking signal is the *degree-normalized* trust
    T(v)/deg(v): honest nodes score ≈ uniformly, sybils ≈ 0.

    Unlike :func:`trust_rank` there is no damping/teleport — mass is
    conserved exactly (Σ T_k = 1 every round on a loop-free connected
    graph), which the tests pin.

    Returns ``[graph_id?, node_id, trust, sybil_score]`` (both rounded
    to 8 decimals; nodes unreached within the round budget are exact
    zeros).  Superstep shape = PageRank's (one edges-side equi-join +
    one grouped sum, 1/deg folded into the static edge table), so
    bucketed adjacency and hub salting apply unchanged.
    """
    from dachshund_spark.iterate import run_fixpoint

    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    if not seeds:
        raise ValueError("seeds must be non-empty")
    seeds = sorted({int(s) for s in seeds})
    und = graph.undirected_edges().where(F.col("src") != F.col("dst"))
    g = gcols(und)
    deg = und.groupBy(*g, F.col("src").alias("node_id")).agg(
        F.count("*").alias("deg")
    )
    # fold the sender's degree into the static edge table once —
    # per-superstep work is then join + SUM(trust/deg), no extra join
    edges = und.join(
        deg.select(*g, F.col("node_id").alias("src"), "deg"), on=g + ["src"]
    ).persist()
    nodes = deg.select(*g, "node_id", "deg")
    present = nodes.where(F.col("node_id").isin(seeds))
    if g:
        # per-graph validation (not a global count — see the PPR
        # multi-graph pitfall in pagerank.py): every graph must contain
        # EVERY seed or its trust mass silently starts below 1
        ok = present.groupBy(*g).agg(F.count("*").alias("ns")).where(
            F.col("ns") == len(seeds)
        )
        bad = nodes.select(*g).distinct().join(ok, on=g, how="left_anti").count()
        if bad:
            raise ValueError(f"{bad} graph(s) missing at least one seed")
    elif present.count() != len(seeds):
        raise ValueError("seed(s) absent from the graph")
    state0 = nodes.select(
        *g,
        "node_id",
        F.when(F.col("node_id").isin(seeds), F.lit(1.0) / len(seeds))
        .otherwise(F.lit(0.0))
        .alias("trust"),
    )

    def step(state: DataFrame, superstep: int) -> DataFrame:
        # join_hint="broadcast" (state ≪ executor memory) kills both
        # per-superstep shuffles — same dial as pagerank's
        inflow = (
            edges.join(
                hinted(
                    state.select(*g, F.col("node_id").alias("src"), "trust"),
                    join_hint,
                ),
                on=g + ["src"],
            )
            .groupBy(*g, F.col("dst").alias("node_id"))
            .agg(F.sum(F.col("trust") / F.col("deg")).alias("trust"))
        )
        return (
            state.select(*g, "node_id")
            .join(hinted(inflow, join_hint), on=g + ["node_id"], how="left")
            .select(
                *g, "node_id", F.coalesce("trust", F.lit(0.0)).alias("trust")
            )
        )

    final, _ = run_fixpoint(state0, step, max_iterations=rounds)
    return final.join(deg, on=g + ["node_id"]).select(
        *g,
        "node_id",
        F.round("trust", 8).alias("trust"),
        F.round(F.col("trust") / F.col("deg"), 8).alias("sybil_score"),
    )


def absorbing_hit_probability(
    graph: LinkGraph,
    targets: list[int],
    absorbers: list[int],
    *,
    rounds: int,
    join_hint: str | None = None,
) -> DataFrame:
    """Truncated absorbing-walk hit probability ("spam proximity"):
    ``[g?, node_id, cls, hit_prob]``.

    h(v) = probability that a uniform random walk from v reaches the
    ``targets`` set (e.g. known spam) before the ``absorbers`` set
    (e.g. trusted core).  Both sets are absorbing boundary conditions
    (h=1 / h=0, frozen); free nodes iterate h ← mean of neighbor h,
    the discrete harmonic extension, truncated at ``rounds`` supersteps
    (monotone from below in the walk-length budget).  The classic
    link-spam feature dual to TrustRank: rank-independent, purely
    topological proximity to the bad set.

    ``cls`` is 'target' / 'absorber' / 'free'.  Superstep shape =
    sybilrank's (edges-side join + grouped sum, receiver degree folded
    into the node table); ``join_hint="broadcast"`` for small states.
    """
    from dachshund_spark.iterate import run_fixpoint

    t = sorted({int(x) for x in targets})
    a = sorted({int(x) for x in absorbers})
    overlap = set(t) & set(a)
    if overlap:
        raise ValueError(f"targets and absorbers overlap: {sorted(overlap)}")
    if not t or not a:
        raise ValueError("targets and absorbers must both be non-empty")
    und = graph.undirected_edges().where(F.col("src") != F.col("dst")).persist()
    g = gcols(und)
    deg = und.groupBy(*g, F.col("src").alias("node_id")).agg(
        F.count("*").alias("deg")
    )
    cls = (
        F.when(F.col("node_id").isin(t), F.lit("target"))
        .when(F.col("node_id").isin(a), F.lit("absorber"))
        .otherwise(F.lit("free"))
    )
    nodes = deg.select(*g, "node_id", "deg", cls.alias("cls")).persist()
    state0 = nodes.select(
        *g,
        "node_id",
        F.when(F.col("cls") == "target", F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("h"),
    )

    def step(state: DataFrame, superstep: int) -> DataFrame:
        inflow = (
            und.join(
                hinted(
                    state.select(*g, F.col("node_id").alias("src"), "h"),
                    join_hint,
                ),
                on=g + ["src"],
            )
            .groupBy(*g, F.col("dst").alias("node_id"))
            .agg(F.sum("h").alias("_s"))
        )
        return (
            nodes.join(hinted(inflow, join_hint), on=g + ["node_id"], how="left")
            .select(
                *g,
                "node_id",
                F.when(F.col("cls") == "target", F.lit(1.0))
                .when(F.col("cls") == "absorber", F.lit(0.0))
                .otherwise(F.coalesce("_s", F.lit(0.0)) / F.col("deg"))
                .alias("h"),
            )
        )

    final, _ = run_fixpoint(state0, step, max_iterations=rounds)
    out = final.join(nodes.select(*g, "node_id", "cls"), on=g + ["node_id"])
    return out.select(
        *g, "node_id", "cls", F.round("h", 8).alias("hit_prob")
    )


def independent_cascade(
    graph: LinkGraph,
    seeds: list[int],
    *,
    p_percent: int = 30,
    rounds: int = 8,
    seed: int = 0,
) -> DataFrame:
    """Seeded independent-cascade activation (Kempe, Kleinberg & Tardos
    2003): ``[g?, node_id, round]`` for every node activated within
    ``rounds`` steps.

    Each directed edge (u, v) fires iff md5('<seed>#ic#u#v') %% 100 <
    ``p_percent`` — the classic coin-flip, derandomized so one
    deterministic live-edge subgraph is shared by every engine (the
    KKT live-edge equivalence: IC spread == reachability in the
    live-edge graph, so the cascade IS a BFS over the surviving
    edges).  ``round`` is the activation step (seeds = 0), i.e. BFS
    depth in the live subgraph.  One md5 filter + ``rounds`` frontier
    supersteps, each a single equi-join — the same scaling story as
    BFS.
    """
    from dachshund_spark.iterate import run_fixpoint
    from dachshund_spark.pipeline.text import md5_long

    if not seeds:
        raise ValueError("seeds must be non-empty")
    sl = sorted({int(s) for s in seeds})
    g = gcols(graph.edges)
    live = graph.edges.where(
        md5_long(
            F.concat_ws("#", F.lit(seed), F.lit("ic"), F.col("src"), F.col("dst"))
        )
        % 100
        < p_percent
    )
    live = live.select(*g, "src", "dst").distinct().persist()
    nodes = graph.nodes()
    state0 = nodes.where(F.col("node_id").isin(sl)).select(
        *g, "node_id", F.lit(0).cast("long").alias("round")
    )

    def step(state: DataFrame, superstep: int) -> DataFrame:
        frontier = state.where(F.col("round") == superstep).select(
            *g, F.col("node_id").alias("src")
        )
        new = (
            live.join(frontier, on=g + ["src"])
            .select(*g, F.col("dst").alias("node_id"))
            .distinct()
            .join(state.select(*g, "node_id"), on=g + ["node_id"], how="left_anti")
            .select(*g, "node_id", F.lit(superstep + 1).cast("long").alias("round"))
        )
        return state.unionByName(new)

    def converged(prev: DataFrame, new: DataFrame) -> tuple[bool, dict]:
        grew = new.count() - prev.count()
        return grew == 0, {"newly_activated": int(grew)}

    final, _ = run_fixpoint(state0, step, converged=converged, max_iterations=rounds)
    live.unpersist()
    return final
