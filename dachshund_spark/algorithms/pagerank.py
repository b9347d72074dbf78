"""PageRank as iterative DataFrame joins with explicit skew handling.

Dachshund ships no PageRank; its closest template is eigenvector
centrality by power iteration
(/root/reference/src/dachshund/algorithms/eigenvector_centrality.rs:16-37):
``x' = x·A`` supersteps with a convergence check.  PageRank is the same
superstep with damping + dangling-mass redistribution, which is what the
north rule requires.  Parity with the reference's evcent fixtures is
validated by running with ``damping=1.0`` on the symmetrized graph and
rescaling (max-norm vs L1-norm) — see tests/test_pagerank.py.

Scale design (100 TB web graph):
- superstep = ranks ⋈ edges on src (shuffle on src, both sides hash
  partitioned identically across supersteps) → groupBy(dst) sum.
- map-side partial aggregation + optional explicit salting
  (:mod:`dachshund_spark.skew`) bound hub-key reducer width.
- dangling mass and per-graph node counts are tiny per-graph aggregates
  → broadcast back.
- lineage truncated every few supersteps; durable snapshots via
  :class:`~dachshund_spark.checkpoint.CheckpointManager` make runs
  resumable mid-iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.checkpoint import CheckpointManager
from dachshund_spark.graph import LinkGraph
from dachshund_spark.iterate import run_fixpoint
from dachshund_spark.skew import salted_sum
from dachshund_spark.util import gcols, hinted


def pagerank(
    graph: LinkGraph,
    *,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iterations: int = 100,
    fixed_iterations: int | None = None,
    undirected: bool = False,
    num_salts: int | None = None,
    hub_threshold: int | None = None,
    weight_col: str | None = None,
    personalization: list[int] | None = None,
    init_ranks: DataFrame | None = None,
    join_hint: str | None = None,
    dedupe_edges: bool = True,
    cache_edges: bool = True,
    manager: CheckpointManager | None = None,
    resume: bool = True,
    metrics_sink: list | None = None,
) -> DataFrame:
    """Returns ``[graph_id?, node_id, pagerank]`` (L1 norm = 1 per graph).

    ``fixed_iterations`` disables the convergence action and runs an
    exact superstep count (used for oracle-parity checks);
    ``num_salts`` routes the contribution sum through the explicit
    two-phase salted path instead of the planner's partial aggregation;
    ``hub_threshold`` (with ``num_salts``) salts ONLY destinations
    whose in-degree is ≥ the threshold — the hub flag is folded into
    the static edge table once before the loop, so the per-superstep
    plan is unchanged while cold keys skip the extra reduce-key blowup;
    ``join_hint`` ("broadcast" | "shuffle_hash" | None) pins the
    rank-side strategy of the per-superstep joins (see util.hinted);
    ``weight_col`` names an edge-weight column — contributions become
    rank · w / Σw(out) instead of rank / out_degree (pass
    ``dedupe_edges=False``: a blind distinct() would drop legitimate
    duplicate weighted rows);
    ``personalization`` restricts the teleport vector to the given
    node ids (uniform over the set): random-surfer restarts land on
    the seed set, the standard personalized-PageRank used for
    seed-relative relevance on link graphs.  Dangling mass follows the
    same teleport vector.

    ``init_ranks`` warm-starts the iteration from a previous
    snapshot's scores (``[graph_id?, node_id, pagerank|rank]``): nodes
    present in the frame start from their prior rank, new nodes from
    1/n, and the vector is renormalized to L1=1 per graph.  This is
    the incremental-crawl path — on slowly-churning link graphs a
    handful of warm supersteps reaches the tolerance a cold start
    needs tens of supersteps for.  Mutually exclusive with
    ``personalization``.
    """
    if weight_col is not None:
        if weight_col not in graph.edges.columns:
            raise ValueError(
                f"edges have no {weight_col!r} column — construct the graph "
                f"with LinkGraph(df, extra_cols=[{weight_col!r}])"
            )
        if undirected:
            raise ValueError(
                "weight_col with undirected=True is unsupported: the "
                "symmetrized view projects attribute columns away"
            )
        if dedupe_edges:
            raise ValueError(
                "weight_col requires dedupe_edges=False: distinct() would "
                "collapse legitimate duplicate weighted rows and silently "
                "halve their weight"
            )
    if init_ranks is not None and personalization is not None:
        raise ValueError(
            "init_ranks with personalization is unsupported: the warm "
            "start would overwrite the teleport-vector init PPR requires"
        )
    if undirected:
        edges = graph.undirected_edges()
    elif dedupe_edges:
        edges = graph.edges.distinct()
    else:
        # caller guarantees pre-deduplicated edges (e.g. a curated
        # parquet/Iceberg edge table); skip the dedup shuffle
        edges = graph.edges
    g = gcols(edges)
    hub_flag_col = None
    if hub_threshold is not None and not num_salts:
        raise ValueError(
            "hub_threshold only routes keys into the salted path — "
            "pass num_salts as well (it was silently ignored otherwise)"
        )
    if num_salts and hub_threshold is not None:
        # degree-aware routing: flag hub destinations ONCE in the
        # static edge table (skew.top_degree_hubs over in-degree);
        # the superstep then salts only flagged rows
        from dachshund_spark.skew import top_degree_hubs

        in_deg = edges.groupBy(*g, F.col("dst").alias("node_id")).agg(
            F.count("*").alias("degree")
        )
        hubs = top_degree_hubs(in_deg, hub_threshold).withColumnRenamed(
            "node_id", "dst"
        )
        edges = edges.join(
            F.broadcast(hubs.withColumn("_dst_is_hub", F.lit(True))),
            on=g + ["dst"] if g else ["dst"],
            how="left",
        ).withColumn("_dst_is_hub", F.coalesce("_dst_is_hub", F.lit(False)))
        hub_flag_col = "_dst_is_hub"
    if cache_edges:
        # cache_edges=False keeps the scan on storage — at 100 TB the
        # edge table doesn't fit cluster RAM and parquet re-scan per
        # superstep is the plan anyway
        edges = edges.persist()

    nodes = graph.nodes()
    n_df = nodes.groupBy(*g).agg(F.count("*").alias("n")) if g else None
    if g:
        nodes = nodes.join(F.broadcast(n_df), on=g)
    else:
        n = nodes.count()
        nodes = nodes.withColumn("n", F.lit(n))
    if weight_col is not None:
        # out_degree generalizes to the outgoing weight sum; the rest
        # of the recurrence (dangling detection, contribution ratio)
        # reads it identically
        out_deg = edges.groupBy(*g, F.col("src").alias("node_id")).agg(
            F.sum(weight_col).cast("double").alias("out_degree")
        )
    else:
        out_deg = edges.groupBy(*g, F.col("src").alias("node_id")).agg(
            F.count("*").alias("out_degree")
        )
    # node table with out-degree (null ⇒ dangling); folded INTO the
    # superstep state so the loop body never joins a static table —
    # each superstep is exactly one edges-side join + one small join
    # (every extra broadcast build is serial driver time)
    base = nodes.join(out_deg, on=g + ["node_id"], how="left")

    pers = personalization is not None
    if pers:
        if not personalization:
            raise ValueError("personalization must be a non-empty id list")
        seeds = sorted({int(x) for x in personalization})
        # Σp must be exactly 1 PER GRAPH or rank mass silently decays
        # every superstep — dedupe, and validate per graph: a global
        # row count over a grouped frame double-counts seeds present in
        # several graphs and misses complementary absences (seed A only
        # in graph 1, seed B only in graph 2)
        if g:
            seed_counts = (
                base.where(F.col("node_id").isin(seeds))
                .groupBy(*g)
                .agg(F.count("*").alias("_n_seeds"))
            )
            n_empty = (
                base.select(*g).distinct().join(seed_counts, on=g, how="left_anti")
            ).count()
            if n_empty:
                raise ValueError(
                    f"{n_empty} graph(s) contain none of the personalization "
                    "ids — their teleport vector would be all-zero"
                )
            # p normalized by the seeds actually present in THAT graph,
            # so Σp == 1 per graph even when node sets differ
            base = base.join(F.broadcast(seed_counts), on=g)
            p_col = F.when(
                F.col("node_id").isin(seeds),
                F.lit(1.0) / F.col("_n_seeds"),
            ).otherwise(F.lit(0.0))
        else:
            n_present = base.where(F.col("node_id").isin(seeds)).count()
            if n_present != len(seeds):
                raise ValueError(
                    f"{len(seeds) - n_present} personalization id(s) are not "
                    "nodes of the graph — teleport mass would leak"
                )
            p_col = F.when(
                F.col("node_id").isin(seeds),
                F.lit(1.0 / len(seeds)),
            ).otherwise(F.lit(0.0))
        # init rank = teleport vector (standard PPR start); p rides in
        # the state so the loop body stays join-free for it
        ranks0 = base.select(
            *g, "node_id", p_col.alias("p"), "out_degree", "n"
        ).withColumn("rank", F.col("p"))
    else:
        ranks0 = base.select(
            *g, "node_id", (1.0 / F.col("n")).alias("rank"), "out_degree", "n"
        )
    if init_ranks is not None:
        rank_col = "pagerank" if "pagerank" in init_ranks.columns else "rank"
        prior = init_ranks.select(
            *g, "node_id", F.col(rank_col).cast("double").alias("_prior")
        )
        raw = base.join(prior, on=g + ["node_id"], how="left").select(
            *g,
            "node_id",
            F.coalesce("_prior", 1.0 / F.col("n")).alias("_raw"),
            "out_degree",
            "n",
        )
        # renormalize to L1=1 per graph: departed nodes took mass with
        # them, new nodes injected 1/n each
        if g:
            tot = raw.groupBy(*g).agg(F.sum("_raw").alias("_tot"))
            raw = raw.join(F.broadcast(tot), on=g)
        else:
            raw = raw.crossJoin(
                F.broadcast(raw.agg(F.sum("_raw").alias("_tot")))
            )
        ranks0 = raw.select(
            *g,
            "node_id",
            (F.col("_raw") / F.col("_tot")).alias("rank"),
            "out_degree",
            "n",
        )

    # dangling handling costs an extra aggregation + join per superstep;
    # skip the subtree entirely when no node is dangling (decided once)
    has_dangling = not base.where(F.col("out_degree").isNull()).isEmpty()

    def step(state: DataFrame, superstep: int) -> DataFrame:
        flag_cols = [hub_flag_col] if hub_flag_col else []
        per_edge_w = (
            (F.col("w") * F.col(weight_col)).alias("w")
            if weight_col is not None
            else F.col("w")
        )
        contribs = (
            edges.join(
                hinted(
                    state.where(F.col("out_degree").isNotNull())
                    .select(*g, F.col("node_id").alias("src"),
                            (F.col("rank") / F.col("out_degree")).alias("w")),
                    join_hint,
                ),
                on=g + ["src"],
            ).select(*g, F.col("dst").alias("node_id"), per_edge_w, *flag_cols)
        )
        if num_salts:
            summed = salted_sum(
                contribs, g + ["node_id"], "w", "contrib", num_salts,
                hub_flag=hub_flag_col,
            )
        else:
            summed = contribs.groupBy(*g, "node_id").agg(F.sum("w").alias("contrib"))
        # small-small join: shuffle-hash (a broadcast would serialize a
        # build on the driver every superstep)
        carry = ["out_degree", "n"] + (["p"] if pers else [])
        joined = state.select(*g, "node_id", *carry).join(
            summed.hint("shuffle_hash"), on=g + ["node_id"], how="left"
        )
        if has_dangling:
            # dangling nodes spread their rank uniformly: one row per graph
            dangling = (
                state.where(F.col("out_degree").isNull())
                .groupBy(*g)
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling_mass"))
            )
            if g:
                joined = joined.join(F.broadcast(dangling), on=g, how="left")
            else:
                # one-row aggregate: broadcast cross join, no driver action
                joined = joined.crossJoin(F.broadcast(dangling))
        else:
            joined = joined.withColumn("dangling_mass", F.lit(0.0))
        if pers:
            new_rank = (
                (1.0 - damping) * F.col("p")
                + damping
                * (
                    F.coalesce(F.col("contrib"), F.lit(0.0))
                    + F.coalesce(F.col("dangling_mass"), F.lit(0.0)) * F.col("p")
                )
            )
        else:
            new_rank = (
                (1.0 - damping) / F.col("n")
                + damping
                * (
                    F.coalesce(F.col("contrib"), F.lit(0.0))
                    + F.coalesce(F.col("dangling_mass"), F.lit(0.0)) / F.col("n")
                )
            )
        return joined.select(
            *g,
            "node_id",
            new_rank.alias("rank"),
            *carry,
        )

    if fixed_iterations is not None and metrics_sink is None:
        converged = None  # run the exact superstep budget
    else:

        def converged(prev: DataFrame, new: DataFrame) -> tuple[bool, dict]:
            # L1 distance between two materialized rank vectors; the
            # residual is ALSO summed as pre-rounded 1e-8 integers
            # (per-term ROUND before the sum) so the metric itself is
            # engine-exact and oracle-able — raw float L1 is not
            row = (
                new.select(*g, "node_id", "rank")
                .join(
                    prev.select(*g, "node_id", F.col("rank").alias("old_rank")),
                    on=g + ["node_id"],
                )
                .agg(
                    F.sum(F.abs(F.col("rank") - F.col("old_rank"))).alias("l1"),
                    F.sum(
                        F.round(
                            F.abs(F.col("rank") - F.col("old_rank"))
                            * F.lit(100_000_000),
                            0,
                        ).cast("long")
                    ).alias("r_e8"),
                    F.count("*").alias("c"),
                )
                .first()
            )
            metrics = {
                "l1_diff": float(row["l1"] or 0.0),
                "residual_e8": int(row["r_e8"] or 0),
                "message_count": int(row["c"]),
            }
            if metrics_sink is not None:
                metrics_sink.append(metrics)
            done = (
                fixed_iterations is None
                and row["l1"] is not None
                and row["l1"] < tol
            )
            return done, metrics

    # `is None`, not truthiness: fixed_iterations=0 is a legitimate
    # "init only" request (e.g. inspecting a warm-start vector)
    budget = max_iterations if fixed_iterations is None else fixed_iterations
    if fixed_iterations is not None and manager is not None and resume:
        latest = manager.latest()
        if latest is not None:
            # fixed_iterations is a *total* superstep count across
            # resumed runs; spend only the remainder
            budget = max(0, fixed_iterations - (latest[0] + 1))

    final, _steps = run_fixpoint(
        ranks0,
        step,
        converged=converged,
        max_iterations=budget,
        manager=manager,
        resume=resume,
    )
    result = final.select(*g, "node_id", F.col("rank").alias("pagerank"))
    if cache_edges:
        edges.unpersist()
    return result


def pagerank_damping_sweep(
    graph: LinkGraph,
    *,
    dampings: "tuple[float, ...]" = (0.5, 0.7, 0.85, 0.95),
    iterations: int = 10,
) -> DataFrame:
    """Damping-factor sensitivity sweep in ONE coupled run:
    ``[node_id, damping_e2, pagerank]`` — the state carries one rank
    column per damping value, so every superstep pays a single edges
    join and a single destination aggregation for ALL sweep points
    (the percolation-curve coupling trick applied to PageRank's main
    hyperparameter).

    Running k sweep points separately costs k full PageRank jobs; at
    100 TB the edges join dominates, so the coupled sweep is ~k×
    cheaper and guarantees every point saw the identical edge view.
    The per-column expression tree is exactly the single-damping
    recurrence ``(1−d)/n + d·(contrib + dangling/n)``, which is what
    makes the unrolled SQL replay line up column-for-column.
    """
    edges = graph.edges.select("src", "dst").distinct().persist()
    nodes = (
        edges.select(F.col("src").alias("node_id"))
        .unionByName(edges.select(F.col("dst").alias("node_id")))
        .distinct()
        .persist()
    )
    n = float(nodes.count())
    outdeg = edges.groupBy(F.col("src").alias("node_id")).agg(
        F.count(F.lit(1)).cast("long").alias("od")
    )
    ks = [f"k{int(round(d * 100))}" for d in dampings]
    state = nodes.join(outdeg, on="node_id", how="left").select(
        "node_id",
        "od",
        *[(F.lit(1.0) / F.lit(n)).alias(k) for k in ks],
    ).localCheckpoint(eager=True)
    for _ in range(int(iterations)):
        dang = state.where(F.col("od").isNull()).agg(
            *[
                F.coalesce(F.sum(k), F.lit(0.0)).alias(f"dm_{k}")
                for k in ks
            ]
        )
        contrib = (
            edges.join(
                state.select(F.col("node_id").alias("src"), "od", *ks),
                on="src",
            )
            .groupBy(F.col("dst").alias("node_id"))
            .agg(*[F.sum(F.col(k) / F.col("od")).alias(f"c_{k}") for k in ks])
        )
        state = (
            state.select("node_id", "od")
            .join(contrib, on="node_id", how="left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node_id",
                "od",
                *[
                    (
                        F.lit((1.0 - d)) / F.lit(n)
                        + F.lit(d)
                        * (
                            F.coalesce(F.col(f"c_{k}"), F.lit(0.0))
                            + F.col(f"dm_{k}") / F.lit(n)
                        )
                    ).alias(k)
                    for d, k in zip(dampings, ks)
                ],
            )
            .localCheckpoint(eager=True)
        )
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(int(round(d * 100))).cast("long").alias("damping_e2"),
                    F.round(F.col(k), 8).alias("pagerank"),
                )
                for d, k in zip(dampings, ks)
            ]
        )
    )
    out = state.select("node_id", rows.alias("_r")).select(
        "node_id",
        F.col("_r.damping_e2").alias("damping_e2"),
        F.col("_r.pagerank").alias("pagerank"),
    )
    edges.unpersist()
    nodes.unpersist()
    return out
