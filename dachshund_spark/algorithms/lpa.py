"""Synchronous label propagation with deterministic tie-breaking.

Dachshund has no LPA (its community detector is sequential CNM greedy
modularity, /root/reference/src/dachshund/algorithms/cnm_communities.rs:79-281
— reproduced in the pandas-UDF local pack); LPA is the scalable
counterpart required by the north rule.  Semantics are pinned so golden
tables are stable (SURVEY.md §2.11 note d):

- init: label(v) = v
- superstep: label'(v) = the modal label among v's neighbors, ties
  broken by the smallest label; isolated nodes keep their own label
- synchronous updates, fixed iteration count (sync LPA can oscillate
  on bipartite structures, so termination is a superstep budget, with
  an optional early stop when no label changes)

Every superstep is one join + one count aggregation + one ``max_by``
aggregation — all JVM-side, partial-aggregated, hub-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.checkpoint import CheckpointManager
from dachshund_spark.graph import LinkGraph
from dachshund_spark.iterate import run_fixpoint
from dachshund_spark.util import gcols, hinted


def _label_counts(
    nbr: DataFrame,
    g: list[str],
    num_salts: int | None,
    hub_flag_col: str | None,
    weight_col: str | None = None,
) -> DataFrame:
    keys = g + ["node_id", "label"]
    if weight_col:
        if num_salts:
            from dachshund_spark.skew import salted_sum

            return salted_sum(
                nbr, keys, weight_col, "cnt", num_salts, hub_flag=hub_flag_col
            )
        return nbr.groupBy(*keys).agg(F.sum(weight_col).alias("cnt"))
    if num_salts:
        from dachshund_spark.skew import salted_count

        return salted_count(nbr, keys, "cnt", num_salts, hub_flag=hub_flag_col)
    return nbr.groupBy(*keys).agg(F.count("*").alias("cnt"))


def label_propagation(
    graph: LinkGraph,
    *,
    iterations: int = 10,
    early_stop: bool = False,
    num_salts: int | None = None,
    hub_threshold: int | None = None,
    weight_col: str | None = None,
    join_hint: str | None = None,
    manager: CheckpointManager | None = None,
    durable_checkpoint_every: int = 5,
    resume: bool = True,
) -> DataFrame:
    """Returns ``[graph_id?, node_id, label]`` after ``iterations``
    synchronous supersteps.

    ``num_salts`` routes the per-(node, label) message count through
    the explicit two-phase salted aggregation — the ``groupBy(node_id,
    label)`` count has the same hub-reducer problem as PageRank's
    contribution sum (a 10^6-in-degree hub's count rows all land on one
    reduce key); ``hub_threshold`` (requires ``num_salts``) folds a hub
    flag into the static symmetrized edge table ONCE so only hot
    destinations pay the salted two-phase path, exactly mirroring
    :func:`~dachshund_spark.algorithms.pagerank.pagerank`'s routing.

    ``weight_col`` names an edge-weight column (the graph must carry it
    via ``LinkGraph(df, extra_cols=[...])``): the modal label becomes
    the one with the largest incident WEIGHT sum instead of the largest
    neighbor count — weighted LPA per Barber & Clark 2009.  Use
    integral-valued weights when determinism matters: float weight sums
    can produce order-dependent near-ties that flip the modal label.
    Duplicate (src, dst) rows collapse to MAX weight (see
    LinkGraph.weighted_undirected_edges).
    """
    if weight_col is not None:
        und = graph.weighted_undirected_edges(weight_col)
    else:
        und = graph.undirected_edges()
    g = gcols(und)
    hub_flag_col = None
    if hub_threshold is not None and not num_salts:
        raise ValueError(
            "hub_threshold only routes keys into the salted path — "
            "pass num_salts as well (it was silently ignored otherwise)"
        )
    if num_salts and hub_threshold is not None:
        from dachshund_spark.skew import top_degree_hubs

        in_deg = und.groupBy(*g, F.col("dst").alias("node_id")).agg(
            F.count("*").alias("degree")
        )
        hubs = top_degree_hubs(in_deg, hub_threshold).withColumnRenamed(
            "node_id", "dst"
        )
        und = und.join(
            F.broadcast(hubs.withColumn("_dst_is_hub", F.lit(True))),
            on=g + ["dst"] if g else ["dst"],
            how="left",
        ).withColumn("_dst_is_hub", F.coalesce("_dst_is_hub", F.lit(False)))
        hub_flag_col = "_dst_is_hub"
    und = und.persist()
    labels0 = graph.nodes().withColumn("label", F.col("node_id"))

    def step(state: DataFrame, superstep: int) -> DataFrame:
        flag_cols = [hub_flag_col] if hub_flag_col else []
        wcols = [weight_col] if weight_col else []
        nbr = und.join(
            hinted(state.withColumnRenamed("node_id", "src"), join_hint),
            on=g + ["src"],
        ).select(
            *g, F.col("dst").alias("node_id"), "label", *wcols, *flag_cols
        )
        counts = _label_counts(nbr, g, num_salts, hub_flag_col, weight_col)
        # modal label, ties -> smallest label: single max_by aggregation.
        # ~label (bitwise NOT), not -label: labels are node ids that may
        # span the full 64-bit range (xxhash64 url ids) and -(-2^63)
        # throws under Spark 4 ANSI mode; ~x = -x-1 reverses the total
        # order for ALL longs with no overflow.
        modal = counts.groupBy(*g, "node_id").agg(
            F.expr("max_by(label, struct(cnt, ~label))").alias("new_label")
        )
        return state.join(modal, on=g + ["node_id"], how="left").select(
            *g,
            "node_id",
            F.coalesce("new_label", "label").alias("label"),
        )

    converged = None
    if early_stop:

        def converged(prev: DataFrame, new: DataFrame) -> tuple[bool, dict]:
            changed = (
                new.withColumnRenamed("label", "nl")
                .join(prev, on=g + ["node_id"])
                .where(F.col("nl") != F.col("label"))
                .count()
            )
            return changed == 0, {"changed": changed}

    final, _ = run_fixpoint(
        labels0,
        step,
        converged=converged,
        max_iterations=iterations,
        manager=manager,
        durable_checkpoint_every=durable_checkpoint_every,
        resume=resume,
    )
    und.unpersist()
    return final


def seeded_label_propagation(
    graph: LinkGraph,
    seeds: DataFrame,
    *,
    iterations: int = 4,
) -> DataFrame:
    """Semi-supervised node classification by label spreading:
    ``[node_id, cls, is_seed]`` after ``iterations`` synchronous
    rounds (the classic seeded LPA — topic/spam class diffusion from
    a labeled seed set over the web graph).

    ``seeds`` is ``[node_id, cls]`` with ``cls`` a small non-negative
    int (< 1024).  Seeds are pinned; every other node takes the modal
    class among its labeled neighbors each round, carrying its
    previous class when none are labeled.  The modal argmax packs
    (count, class) into ONE BIGINT — ``count·1024 + (1023 − cls)`` —
    so "max count, ties to the smallest class" is a single MAX in
    both engines (no struct-comparison semantics to trust).

    Per round: one equi-join of the undirected edges against the
    labeled state, a (node, cls) count, one packed MAX — all
    partial-aggregable; state localCheckpoints per superstep.
    """
    und = graph.undirected_edges().select("src", "dst").distinct()
    state = (
        graph.nodes()
        .join(seeds.select("node_id", F.col("cls").cast("long").alias("_s")), on="node_id", how="left")
        .select(
            "node_id",
            F.col("_s").alias("cls"),
            F.col("_s").isNotNull().alias("is_seed"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(int(iterations)):
        labeled = state.where(F.col("cls").isNotNull()).select(
            F.col("node_id").alias("src"), F.col("cls").alias("_c")
        )
        counts = (
            und.join(labeled, on="src")
            .groupBy(F.col("dst").alias("node_id"), "_c")
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        modal = counts.groupBy("node_id").agg(
            F.max(F.col("_n") * 1024 + (F.lit(1023) - F.col("_c"))).alias("_pk")
        )
        state = (
            state.join(modal, on="node_id", how="left")
            .select(
                "node_id",
                F.when(F.col("is_seed"), F.col("cls"))
                .otherwise(
                    F.coalesce(F.lit(1023) - F.pmod(F.col("_pk"), F.lit(1024)), F.col("cls"))
                )
                .alias("cls"),
                "is_seed",
            )
            .localCheckpoint(eager=True)
        )
    return state
