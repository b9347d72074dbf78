"""Connected components via hash-min label exchange.

Reproduces the semantics of the reference's BFS flood fill
(/root/reference/src/dachshund/algorithms/connected_components.rs:20-82):
every node ends up labeled by its component, and components are numbered
in increasing order of their smallest member id (the reference pops seeds
from an ordered BTreeSet, :26-34).

The distributed formulation is the classic hash-min fixpoint: each node
holds a candidate label (init = own id); each superstep every node takes
the min of its own label and its neighbors' labels; converged when no
label changes.  Iterations ≈ graph diameter (~16-20 for web graphs).
All supersteps are DataFrame joins + partial-aggregated ``min`` — no
Python in the loop body.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dachshund_spark.checkpoint import CheckpointManager
from dachshund_spark.graph import LinkGraph
from dachshund_spark.iterate import run_fixpoint
from dachshund_spark.util import gcols, hinted


def connected_components(
    graph: LinkGraph,
    *,
    max_iterations: int = 200,
    renumber: bool = True,
    join_hint: str | None = None,
    nodes: DataFrame | None = None,
    warm_start: DataFrame | None = None,
    manager: CheckpointManager | None = None,
    durable_checkpoint_every: int = 5,
    resume: bool = True,
) -> DataFrame:
    """Per-node component labels.

    Returns ``[graph_id?, node_id, component]`` where ``component`` is
    the smallest node id in the component (scale-stable label), plus —
    when ``renumber=True`` — ``component_id``: the 0-based index of the
    component in increasing order of its smallest member, matching the
    reference's output numbering
    (/root/reference/src/dachshund/algorithms/connected_components.rs:26-34).
    ``renumber=False`` skips the extra distinct+rank for huge graphs
    with many components.  ``nodes`` overrides the edge-derived node
    set — pass the full node table to give isolated (degree-0) nodes a
    component slot, the reference's quirk
    (connected_components.rs:45-70).

    ``warm_start`` (``[graph_id?, node_id, component]``, e.g. the output
    of a previous snapshot's run) seeds labels incrementally: nodes of
    *intact* old components (no member deleted since the snapshot)
    start from their old component label (the min node id of their old
    component — a still-existing member, so a valid upper bound), new
    nodes from their own id.  Old components that LOST a member fall
    back to cold seeds (own ids) for their survivors: a deleted node
    may have been the label itself or a cut vertex whose removal split
    the component, and either way the stale shared label would survive
    the hash-min fixpoint as a wrong answer (two split halves would
    even share one label).  With that guard the run converges to
    exactly the cold-run labels — the fixpoint of hash-min is the
    per-component min of the INITIAL labels; intact old components sit
    entirely inside one new component (edges are only added between
    snapshots for them), so min(intact component mins ∪ own ids) ==
    the canonical min — in rounds bounded by the changed region rather
    than the whole graph's diameter (the batch-incremental crawl
    path).  Caveat: EDGE deletions are not detectable from labels
    alone — a delta that removes an edge while keeping both endpoints
    must use a cold run (crawl snapshots delete pages, i.e. nodes, so
    the node-level guard covers the deployment path).
    """
    und = graph.undirected_edges().persist()
    g = gcols(und)
    node_df = nodes if nodes is not None else graph.nodes()
    labels = node_df.select(*gcols(node_df), "node_id").withColumn(
        "label", F.col("node_id")
    )
    if warm_start is not None:
        ws = warm_start.select(
            *gcols(warm_start), "node_id", F.col("component").alias("_w")
        )
        # deletion guard: flag old components with any member missing
        # from the current node set — their survivors seed cold (own
        # id).  One extra groupBy over the snapshot labels; without it
        # a deleted label-node (or cut vertex) leaves a stale shared
        # label that hash-min can never raise.
        live = ws.join(
            labels.select(*g, "node_id", F.lit(1).alias("_live")),
            on=g + ["node_id"],
            how="left",
        )
        intact = (
            live.groupBy(*g, "_w")
            .agg(F.min(F.coalesce("_live", F.lit(0))).alias("_intact"))
        )
        seeds = (
            live.where(F.col("_live") == 1)
            .join(intact, on=g + ["_w"])
            .select(
                *g,
                "node_id",
                F.when(F.col("_intact") == 1, F.col("_w"))
                .otherwise(F.col("node_id"))
                .alias("_w"),
            )
        )
        labels = (
            labels.join(seeds, on=g + ["node_id"], how="left")
            .select(
                *g, "node_id", F.coalesce("_w", F.col("node_id")).alias("label")
            )
        )

    def step(state: DataFrame, superstep: int) -> DataFrame:
        nbr_labels = und.join(
            hinted(state.withColumnRenamed("node_id", "src"), join_hint),
            on=g + ["src"],
        ).select(*g, F.col("dst").alias("node_id"), "label")
        return (
            state.select(*g, "node_id", "label")
            .union(nbr_labels)
            .groupBy(*g, "node_id")
            .agg(F.min("label").alias("label"))
        )

    # labels are monotonically non-increasing, so the global label sum
    # strictly decreases until the fixpoint — one cheap action on the
    # materialized state per superstep.  Summed as decimal(38,0): node
    # ids may span the full 64-bit range (e.g. xxhash64 url ids from
    # pages_to_edges), and a long sum of ~2^63-scale labels overflows —
    # fatal under Spark 4 ANSI mode.
    label_dec = F.col("label").cast("decimal(38,0)")

    def converged(prev: DataFrame, new: DataFrame) -> tuple[bool, dict]:
        new_sum, n_msgs = new.agg(F.sum(label_dec), F.count("*")).first()
        old_sum = prev.agg(F.sum(label_dec)).first()[0]
        return new_sum == old_sum, {
            "message_count": int(n_msgs),
            "label_sum": int(new_sum) if new_sum is not None else 0,
        }

    final, _steps = run_fixpoint(
        labels,
        step,
        converged=converged,
        max_iterations=max_iterations,
        manager=manager,
        durable_checkpoint_every=durable_checkpoint_every,
        resume=resume,
    )
    result = final.withColumnRenamed("label", "component")
    if renumber:
        comps = result.select(*g, "component").distinct()
        if g:
            # multi-graph frames: the window is already partitioned per
            # graph (fixture-scale groups), no single-partition funnel
            w = Window.partitionBy(*g).orderBy("component")
            comps = comps.withColumn(
                "component_id", (F.dense_rank().over(w) - 1).cast("long")
            )
            n_comps = comps.count()
        else:
            comps, n_comps = _two_phase_rank(comps)
        # size-gated broadcast: a sparse crawl slice can have hundreds
        # of millions of components — past the gate, fall back to a
        # plain shuffle join instead of blowing up the driver
        if n_comps <= _BROADCAST_COMPONENT_GATE:
            comps = F.broadcast(comps)
        result = result.join(comps, on=g + ["component"])
    und.unpersist()
    return result


# components above this count shuffle-join back instead of broadcasting
_BROADCAST_COMPONENT_GATE = 4_000_000
_RANK_BUCKETS = 1024


def _two_phase_rank(comps: DataFrame) -> tuple[DataFrame, int]:
    """Dense-rank distinct component labels without a global
    single-partition window.

    Phase 1: order-consistent bucketing via ``width_bucket`` over the
    label range (monotone, so bucket order == label order), then a
    per-bucket ``row_number`` — every bucket is an independent window
    partition.  Phase 2: per-bucket counts (≤ ``_RANK_BUCKETS``+2 rows)
    come to the driver, cumulative offsets go back as a broadcast join.
    ``component_id = offset(bucket) + local_rank - 1`` reproduces the
    global dense rank exactly (labels are distinct, so row_number ==
    dense_rank within a bucket).
    """
    lo, hi = comps.agg(F.min("component"), F.max("component")).first()
    if lo is None:
        return comps.withColumn("component_id", F.lit(0).cast("long")), 0
    if lo == hi:
        # single distinct label: rank is trivially 0 — emitting the
        # window here would compile to a (1-row, but flagged) global
        # SinglePartition exchange
        return comps.withColumn("component_id", F.lit(0).cast("long")), 1
    # long→double is monotone non-decreasing, so ties from lost
    # precision stay inside one bucket and never reorder across
    bucket_col = F.width_bucket(
        F.col("component").cast("double"),
        F.lit(float(lo)),
        F.lit(float(hi)),
        F.lit(_RANK_BUCKETS),
    )
    b = comps.withColumn("_bucket", bucket_col)
    w_local = Window.partitionBy("_bucket").orderBy("component")
    b = b.withColumn("_lr", F.row_number().over(w_local))
    counts = sorted(
        (r["_bucket"], r["cnt"])
        for r in b.groupBy("_bucket").agg(F.count("*").alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for bucket, cnt in counts:
        offsets.append((bucket, acc))
        acc += cnt
    off_df = comps.sparkSession.createDataFrame(
        [(int(bkt), int(off)) for bkt, off in offsets],
        "_bucket long, _offset long",
    )
    ranked = (
        b.join(F.broadcast(off_df), on="_bucket")
        .withColumn(
            "component_id", (F.col("_offset") + F.col("_lr") - F.lit(1)).cast("long")
        )
        .drop("_bucket", "_lr", "_offset")
    )
    return ranked, acc


def connected_components_star(
    graph: LinkGraph,
    *,
    max_iterations: int = 50,
    nodes: DataFrame | None = None,
    manager: CheckpointManager | None = None,
    durable_checkpoint_every: int = 5,
    resume: bool = True,
) -> tuple[DataFrame, int]:
    """O(log n)-round CC via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014).  Returns ``([g?, node_id, component], rounds)`` with
    ``component`` = smallest member id — identical labels to
    :func:`connected_components` (equivalence-tested), but the round
    count is O(log n) instead of O(diameter): hash-min needs ~n
    supersteps on an n-node path (a union of crawl frontiers or any
    long-chain adversarial graph), star-contraction needs ~log n.

    One round = large-star (every strictly-larger neighbor of u
    attaches to min(Γ(u) ∪ u)) then small-star (every smaller neighbor
    attaches to the min).  State is the contracted edge set, always
    oriented big→small; converged when the edge set is stable
    (checksum: count + hash-sum, ANSI-safe mod 2^40).  At the fixpoint
    the edges form depth-1 stars rooted at each component's minimum.
    """
    und = graph.undirected_edges()
    g = gcols(und)
    node_df = nodes if nodes is not None else graph.nodes()
    e0 = und.where(F.col("src") > F.col("dst"))

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.union(
            e.select(*g, F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        m = (
            sym.groupBy(*g, "src")
            .agg(F.min("dst").alias("_mn"))
            .select(*g, "src", F.least("_mn", F.col("src")).alias("m"))
        )
        return (
            sym.join(m, on=g + ["src"])
            .where(F.col("dst") > F.col("src"))
            .select(*g, F.col("dst").alias("src"), F.col("m").alias("dst"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # e is big→small; per big endpoint u the min neighbor is the
        # new root, and u plus every other small neighbor attach to it
        m = e.groupBy(*g, "src").agg(F.min("dst").alias("m"))
        self_rows = m.select(*g, "src", F.col("m").alias("dst"))
        nbr_rows = (
            e.join(m, on=g + ["src"])
            .where(F.col("dst") != F.col("m"))
            .select(*g, F.col("dst").alias("src"), F.col("m").alias("dst"))
        )
        return self_rows.union(nbr_rows).distinct()

    def step(state: DataFrame, superstep: int) -> DataFrame:
        return small_star(large_star(state))

    chk = F.pmod(F.xxhash64("src", "dst"), F.lit(1 << 40)).cast("decimal(38,0)")

    def converged(prev: DataFrame, new: DataFrame) -> tuple[bool, dict]:
        n, s = new.agg(F.count("*"), F.sum(chk)).first()
        pn, ps = prev.agg(F.count("*"), F.sum(chk)).first()
        return (n == pn and s == ps), {"edges": int(n)}

    final, rounds = run_fixpoint(
        e0,
        step,
        converged=converged,
        max_iterations=max_iterations,
        manager=manager,
        durable_checkpoint_every=durable_checkpoint_every,
        resume=resume,
    )
    labels = final.select(
        *g, F.col("src").alias("node_id"), F.col("dst").alias("component")
    )
    roots = node_df.select(*g, "node_id").join(
        labels.select(*g, "node_id"), on=g + ["node_id"], how="left_anti"
    ).withColumn("component", F.col("node_id"))
    return labels.unionByName(roots), rounds


def weakly_connected_components(graph: LinkGraph, **kwargs) -> DataFrame:
    """Directed WCC == CC over the symmetrized edge set
    (/root/reference/src/dachshund/algorithms/connected_components.rs:94-102)."""
    return connected_components(graph, **kwargs)


def is_connected(graph: LinkGraph) -> bool:
    """Connectivity check (errors on the empty graph, matching
    /root/reference/src/dachshund/algorithms/connectivity.rs:17-30)."""
    cc = connected_components(graph, renumber=False)
    n = cc.count()
    if n == 0:
        raise ValueError("Graph is empty")
    return cc.select("component").distinct().count() == 1
