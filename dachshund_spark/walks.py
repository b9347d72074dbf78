"""Deterministic random-walk corpus generation (DeepWalk-style).

Training-data pipelines for graph embeddings (DeepWalk / node2vec)
need billions of fixed-length random walks — a per-node corpus the
skip-gram stage consumes.  This operator generates them fully
distributed AND fully deterministically: the step-t choice out of node
v on walk (s, w) is ``md5(seed#s#w#t#v) % degree(v)`` over the node's
neighbors sorted by id, so there is no RNG state to ship, re-runs are
reproducible, and a SQL oracle can replay every walk exactly.

Per step: one join against the ranked adjacency (neighbor lists never
materialize as arrays — the pick is a (src, rn) equi-join, hub-safe)
plus the running path append.  Walks that hit a sink stop growing
(their path simply stays short).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.pipeline.text import md5_long
from dachshund_spark.util import gcols


def ranked_adjacency(graph: LinkGraph) -> DataFrame:
    """[g?, src, dst, rn, degree] — neighbors numbered 1..degree in
    ascending dst order (the deterministic pick table)."""
    from pyspark.sql import Window

    und = graph.undirected_edges()
    g = gcols(und)
    w = Window.partitionBy(*g, "src").orderBy("dst")
    deg = und.groupBy(*g, "src").agg(F.count("*").alias("degree"))
    return (
        und.withColumn("rn", F.row_number().over(w))
        .join(deg, on=g + ["src"])
    )


def skipgram_pairs(
    walks: DataFrame, window: int = 2, walk_col: str = "walk"
) -> DataFrame:
    """(center, context) training pairs for word2vec-style embedding
    training over a walk corpus: [g?, center, context, cnt].

    Consumes the output of :func:`random_walks` / :func:`node2vec_walks`
    (the '->'-serialized corpus): every ordered pair of nodes within
    ``window`` positions of each other on the same walk contributes one
    count, exactly the skip-gram context extraction DeepWalk/node2vec
    feed to word2vec.  Pure column algebra: split + posexplode + a
    per-walk self-join banded on |Δpos| ≤ window (each walk joins only
    against its own ≤ walk_length positions — never cross-walk), then
    one count aggregation on (center, context).
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    g = [c for c in walks.columns if c not in
         ("start_node", "walk_idx", walk_col)]
    keys = g + ["start_node", "walk_idx"]
    toks = walks.select(
        *keys,
        F.posexplode(F.split(F.col(walk_col), "->")).alias("pos", "node"),
    ).select(*keys, "pos", F.col("node").cast("long").alias("node"))
    a = toks.select(*keys, F.col("pos").alias("pa"), F.col("node").alias("center"))
    b = toks.select(*keys, F.col("pos").alias("pb"), F.col("node").alias("context"))
    return (
        a.join(b, on=keys)
        .where(
            (F.col("pa") != F.col("pb"))
            & (F.abs(F.col("pa") - F.col("pb")) <= window)
        )
        .groupBy(*g, "center", "context")
        .agg(F.count("*").alias("cnt"))
    )


def node2vec_walks(
    graph: LinkGraph,
    walk_length: int = 8,
    walks_per_node: int = 1,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 0,
    weight_scale: int = 1000,
) -> DataFrame:
    """Second-order biased walks (node2vec, Grover & Leskovec 2016):
    [g?, start_node, walk_idx, walk].

    The step out of ``cur`` with previous node ``prev`` weights each
    neighbor ``x`` by 1/p (return, x == prev), 1 (x adjacent to prev),
    or 1/q (exploration) — here as INTEGER weights
    ``round(weight_scale/p) / weight_scale / round(weight_scale/q)`` so
    the cumulative-sum pick is exact integer arithmetic, replayable
    bit-for-bit by a SQL oracle (no order-dependent float sums).  The
    pick threshold is ``md5(seed#n2v#start#widx#t#prev#cur) %
    total_weight``; the chosen neighbor is the first (ascending-dst
    rank) whose cumulative weight exceeds it.

    Step 1 has no ``prev`` and is the uniform DeepWalk pick (same
    md5-rank formula as :func:`random_walks`).

    Scale note: unlike the first-order walk (an O(1) (src, rn)
    equi-join per step), an exact second-order step must see ALL of
    ``cur``'s neighbors to weight them — per-step cost is
    O(active_walks × avg_degree), the same join shape as one PageRank
    superstep.  The classic alias-table trick trades this for
    O(Σ_v deg(v)²) precomputed state per directed edge, which is the
    wrong trade at web scale; the per-step join keeps state O(walks).
    The neighbor flag (x adjacent to prev) is an equi-join against the
    symmetrized edge table, and the cumulative sum is a per-walk window
    (each partition = one walk's ≤ degree(cur) candidate rows — hub
    fan-out bounded by one walk's neighborhood, never collected).
    """
    if walks_per_node < 1:
        raise ValueError("walks_per_node must be >= 1")
    if walk_length < 1:
        raise ValueError("walk_length must be >= 1")
    if p <= 0 or q <= 0:
        raise ValueError("p and q must be positive")
    from pyspark.sql import Window

    w_return = int(round(weight_scale / p))
    w_common = int(weight_scale)
    w_far = int(round(weight_scale / q))
    if min(w_return, w_far) < 1:
        raise ValueError("p/q too large for weight_scale (weight rounds to 0)")

    adj = ranked_adjacency(graph).persist()
    g = gcols(graph.edges)
    und = adj.select(*g, "src", "dst")
    starts = graph.nodes().select(
        *g,
        F.col("node_id").alias("start_node"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("_wi"),
    ).select(*g, "start_node", F.col("_wi").cast("long").alias("walk_idx"))
    if walk_length == 1:
        adj.unpersist()
        return starts.select(
            *g, "start_node", "walk_idx",
            F.col("start_node").cast("string").alias("walk"),
        )

    # ---- t=1: uniform first step (no prev), DeepWalk pick formula
    pick1 = (
        F.pmod(
            md5_long(
                F.concat_ws(
                    "#",
                    F.lit(seed),
                    F.col("start_node"),
                    F.col("walk_idx"),
                    F.lit(1),
                    F.col("start_node"),
                )
            ),
            F.col("degree"),
        )
        + 1
    )
    state = (
        starts.join(
            adj.select(
                *g, F.col("src").alias("start_node"), "rn", "degree",
                F.col("dst").alias("cur"),
            ),
            on=g + ["start_node"],
        )
        .where(F.col("rn") == pick1)
        .select(
            *g,
            "start_node",
            "walk_idx",
            F.col("start_node").alias("prev"),
            "cur",
            F.concat_ws("->", F.col("start_node"), F.col("cur")).alias("walk"),
        )
        .localCheckpoint(eager=True)
    )
    # start nodes with no non-self-loop adjacency (ranked_adjacency
    # drops self loops) would silently vanish in the inner join above;
    # keep their length-1 walks — same sink semantics as random_walks
    # and as walk_length == 1
    sink_rows = (
        starts.join(
            adj.select(*g, F.col("src").alias("start_node")).distinct(),
            on=g + ["start_node"],
            how="left_anti",
        )
        .select(
            *g,
            "start_node",
            "walk_idx",
            F.col("start_node").cast("string").alias("walk"),
        )
        .localCheckpoint(eager=True)
    )

    w_walk = Window.partitionBy(*g, "start_node", "walk_idx")
    for t in range(2, walk_length):
        cand = state.join(
            adj.select(
                *g, F.col("src").alias("cur"), F.col("dst").alias("x"), "rn"
            ),
            on=g + ["cur"],
        )
        # x adjacent to prev?  equi-join against the symmetric edge set
        flag = und.select(
            *g, F.col("src").alias("prev"), F.col("dst").alias("x"),
            F.lit(True).alias("_adj_prev"),
        )
        cand = cand.join(flag, on=g + ["prev", "x"], how="left")
        wcol = (
            F.when(F.col("x") == F.col("prev"), F.lit(w_return))
            .when(F.col("_adj_prev"), F.lit(w_common))
            .otherwise(F.lit(w_far))
            .cast("long")
        )
        cand = cand.withColumn("_w", wcol)
        cum = F.sum("_w").over(w_walk.orderBy("rn").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        ))
        tot = F.sum("_w").over(w_walk)
        thr = F.pmod(
            md5_long(
                F.concat_ws(
                    "#",
                    F.lit(seed),
                    F.lit("n2v"),
                    F.col("start_node"),
                    F.col("walk_idx"),
                    F.lit(t),
                    F.col("prev"),
                    F.col("cur"),
                )
            ),
            tot,
        )
        new_state = (
            cand.withColumn("_cum", cum)
            .withColumn("_thr", thr)
            .where(
                (F.col("_thr") >= F.col("_cum") - F.col("_w"))
                & (F.col("_thr") < F.col("_cum"))
            )
            .select(
                *g,
                "start_node",
                "walk_idx",
                F.col("cur").alias("prev"),
                F.col("x").alias("cur"),
                F.concat_ws("->", "walk", F.col("x")).alias("walk"),
            )
            .localCheckpoint(eager=True)
        )
        state.unpersist()
        state = new_state
    adj.unpersist()
    return state.select(*g, "start_node", "walk_idx", "walk").unionByName(
        sink_rows
    )


def random_walks(
    graph: LinkGraph,
    walk_length: int = 8,
    walks_per_node: int = 1,
    seed: int = 0,
) -> DataFrame:
    """[g?, start_node, walk_idx, walk] — ``walk`` is the '->'-joined
    node string (array semantics, serialized so downstream sorts and
    the driver's rows-only canonicalization both work)."""
    if walks_per_node < 1:
        raise ValueError("walks_per_node must be >= 1")
    if walk_length < 1:
        raise ValueError("walk_length must be >= 1")
    adj = ranked_adjacency(graph).persist()
    g = gcols(graph.edges)
    # static per-node degree lookup, computed once (NOT per step)
    deg_tbl = adj.select(*g, F.col("src").alias("cur"), "degree").distinct().persist()
    starts = graph.nodes().select(
        *g,
        F.col("node_id").alias("start_node"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("_wi"),
    ).select(*g, "start_node", F.col("_wi").cast("long").alias("walk_idx"))
    state = starts.select(
        *g,
        "start_node",
        "walk_idx",
        F.col("start_node").alias("cur"),
        F.col("start_node").cast("string").alias("walk"),
        F.lit(False).alias("done"),
    ).localCheckpoint(eager=True)

    for t in range(1, walk_length):
        pick = (
            F.pmod(
                md5_long(
                    F.concat_ws(
                        "#",
                        F.lit(seed),
                        F.col("start_node"),
                        F.col("walk_idx"),
                        F.lit(t),
                        F.col("cur"),
                    )
                ),
                F.col("degree"),
            )
            + 1
        )
        stepped = (
            state.where(~F.col("done"))
            .join(deg_tbl, on=g + ["cur"], how="left")
            .withColumn("_pick", F.when(F.col("degree").isNotNull(), pick))
        )
        moved = (
            stepped.where(F.col("_pick").isNotNull())
            .join(
                adj.select(
                    *g, F.col("src").alias("cur"), F.col("rn").alias("_pick"),
                    F.col("dst").alias("nxt"),
                ),
                on=g + ["cur", "_pick"],
            )
            .select(
                *g,
                "start_node",
                "walk_idx",
                F.col("nxt").alias("cur"),
                F.concat_ws("->", "walk", F.col("nxt")).alias("walk"),
                F.lit(False).alias("done"),
            )
        )
        stuck = stepped.where(F.col("_pick").isNull()).select(
            *g, "start_node", "walk_idx", "cur", "walk", F.lit(True).alias("done")
        )
        finished = state.where(F.col("done"))
        new_state = moved.unionByName(stuck).unionByName(finished).localCheckpoint(
            eager=True
        )
        # release the superseded snapshot: only ONE corpus copy stays
        # materialized, not walk_length of them
        state.unpersist()
        state = new_state
    deg_tbl.unpersist()
    adj.unpersist()
    return state.select(*g, "start_node", "walk_idx", "walk")


def forest_fire_sample(
    graph: LinkGraph,
    *,
    rounds: int = 8,
    seed: int = 0,
    seed_mod: int = 64,
    p_num: int = 1,
    p_den: int = 2,
) -> DataFrame:
    """Forest-fire graph sample: ``[g?, node_id, round_burned]`` — the
    nodes reached by a Bernoulli burning process started from hash-
    chosen ignition points (Leskovec & Faloutsos 2006, "Sampling from
    large graphs"; the Bernoulli-per-edge simplification of the
    geometric forward-burning model of Leskovec et al. 2005).

    Ignition: nodes whose md5 priority ≡ 0 (mod ``seed_mod``) burn at
    round 0 — fully distributed seed choice, no collect.  Each round,
    every undirected edge out of the newest burn frontier catches with
    probability ``p_num/p_den`` via a seeded md5 coin on
    ``(src, dst, round)``; a node burns if ANY incident coin fires.
    Forest-fire samples preserve degree/diameter shape far better than
    uniform node/edge sampling, which is why crawl subsetting uses it.

    Every coin is a pure hash of the edge and round — no RNG state, so
    the whole process replays exactly in SQL.  Per round: one frontier
    equi-join + distinct + anti-join against the burned set (all
    hub-safe partial aggregations), frontier checkpointed.  Early-out
    when the fire dies; rounds past extinction are no-ops, so a fixed
    oracle unroll matches.
    """
    und = graph.undirected_edges().persist()
    g = gcols(und)
    pri = md5_long(
        F.concat(F.lit(f"ff{seed}#"), F.col("node_id").cast("string"))
    )
    burned = (
        graph.nodes()
        .where(pri % F.lit(int(seed_mod)) == 0)
        .select(*g, "node_id", F.lit(0).cast("long").alias("round_burned"))
        .localCheckpoint(eager=True)
    )
    frontier = burned.select(*g, "node_id")
    for r in range(1, int(rounds) + 1):
        coin = (
            md5_long(
                F.concat(
                    F.lit(f"ffc{seed}#"),
                    F.col("src").cast("string"),
                    F.lit(":"),
                    F.col("dst").cast("string"),
                    F.lit(":"),
                    F.lit(str(r)),
                )
            )
            % F.lit(int(p_den))
            < F.lit(int(p_num))
        )
        newly = (
            und.join(
                frontier.select(*g, F.col("node_id").alias("src")),
                on=g + ["src"],
            )
            .where(coin)
            .select(*g, F.col("dst").alias("node_id"))
            .distinct()
            .join(
                burned.select(*g, "node_id"), on=g + ["node_id"], how="left_anti"
            )
            .select(*g, "node_id", F.lit(r).cast("long").alias("round_burned"))
            .localCheckpoint(eager=True)
        )
        if newly.limit(1).count() == 0:
            break
        burned = burned.unionByName(newly).localCheckpoint(eager=True)
        frontier = newly.select(*g, "node_id")
    und.unpersist()
    return burned
