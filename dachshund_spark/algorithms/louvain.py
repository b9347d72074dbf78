"""Louvain-style local moving with integer-exact modularity gains.

Dachshund's community detector is sequential CNM greedy modularity
(/root/reference/src/dachshund/algorithms/cnm_communities.rs:79-281,
reproduced in the pandas-UDF local pack); Louvain local moving is the
scalable counterpart — the standard first phase of distributed Louvain
(Blondel et al. 2008; synchronized variant per Grappolo / parallel
Louvain literature).

Semantics are pinned so the DuckDB oracle can replay every round:

- init: each node is its own community, ``label(v) = v``
- one synchronized round: every node simultaneously moves to the
  candidate community ``c`` (the communities of its neighbors, plus its
  current one) maximizing the modularity gain of membership

      dQ(i -> c)  ∝  e_ic − k_i · vol'_c / (2m)

  where ``e_ic`` is the number of (symmetrized) edges from ``i`` into
  ``c``, ``k_i`` its degree, and ``vol'_c`` the community volume with
  ``i``'s own degree removed when ``i`` is already a member.  The
  comparison is done on the exact integer key

      key = 2m · e_ic − k_i · vol'_c

  (multiply through by the positive constant 2m) so the argmax is
  engine-independent — no float division anywhere.  Ties break to the
  smallest community label.
- anti-swap rule: on EVEN rounds (0-based) a node may only move toward
  labels ≤ its current one.  Unrestricted synchronized moving from
  singleton init oscillates (two singletons that want to merge trade
  labels forever); restricting every other round breaks the symmetry
  deterministically (cf. the min-label heuristics in parallel Louvain,
  Lu/Halappanavar/Kalyanaraman 2015) while odd rounds keep label flow
  bidirectional.  On a 4-block planted partition this reaches the
  planted communities in 8 rounds (Q = 0.65); unrestricted never
  converges (Q < 0).
- fixed round count; (like LPA) termination is a round budget, and the
  fixed-round labeling itself is the pinned output.

Scale notes: each round is two joins + two aggregations over the
symmetrized edge table, all JVM-side with partial aggregation.  The
integer key needs ``2m · max(e_ic)`` and ``k_max · vol_max`` to fit a
long: safe to ~10^9 edges per graph; past that, cast the key to
``decimal(38, 0)`` (the comparison stays exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.checkpoint import CheckpointManager
from dachshund_spark.graph import LinkGraph
from dachshund_spark.iterate import run_fixpoint
from dachshund_spark.util import gcols, hinted


def louvain_move(
    graph: LinkGraph,
    *,
    rounds: int = 8,
    join_hint: str | None = None,
    manager: CheckpointManager | None = None,
    durable_checkpoint_every: int = 5,
    resume: bool = True,
) -> DataFrame:
    """Returns ``[graph_id?, node_id, label]`` after ``rounds``
    synchronized best-gain moves (singleton init).

    Per round, per graph: 2m, degrees, and the current community
    volumes are exact BIGINTs; each node's move key is
    ``2m·e_ic − k_i·(vol_c − k_i·[label_i = c])`` and the move is
    ``max_by(c, struct(key, ~c))`` — a single skew-tolerant aggregation
    (``~c`` reverses label order ANSI-safely for full-range ids).
    """
    und = graph.undirected_edges().persist()
    g = gcols(und)
    deg = und.groupBy(*g, F.col("src").alias("node_id")).agg(
        F.count("*").alias("k")
    )
    m2 = und.groupBy(*g).agg(F.count("*").alias("m2")) if g else (
        und.agg(F.count("*").alias("m2"))
    )
    # fold the static per-node degree into the state so each round
    # needs no extra join against deg
    labels0 = (
        graph.nodes()
        .join(deg, on=g + ["node_id"])
        .withColumn("label", F.col("node_id"))
        .select(*g, "node_id", "k", "label")
    )

    def step(state: DataFrame, superstep: int) -> DataFrame:
        # e_ic: symmetrized-edge count from each node into each
        # neighboring community (one shuffle, partial-aggregated)
        e = (
            und.join(
                hinted(
                    state.select(
                        *g, F.col("node_id").alias("dst"), F.col("label").alias("c")
                    ),
                    join_hint,
                ),
                on=g + ["dst"],
            )
            .groupBy(*g, F.col("src").alias("node_id"), "c")
            .agg(F.count("*").alias("e"))
        )
        # staying put is always a candidate, even when the node has no
        # neighbor left in its current community (e = 0)
        stay = state.select(
            *g, "node_id", F.col("label").alias("c"), F.lit(0).cast("long").alias("e")
        )
        cand = (
            e.unionByName(stay)
            .groupBy(*g, "node_id", "c")
            .agg(F.max("e").alias("e"))
        )
        if superstep % 2 == 0:
            # anti-swap restriction: on even rounds a node may only move
            # toward SMALLER labels (its own is always allowed).  Without
            # it, synchronized best-gain moving from singleton init
            # oscillates (i and j endlessly trade labels); restricting
            # every other round breaks the symmetry while the free odd
            # rounds let labels still flow in both directions.
            cur = state.select(*g, "node_id", F.col("label").alias("_cur"))
            cand = (
                cand.join(cur, on=g + ["node_id"])
                .where(F.col("c") <= F.col("_cur"))
                .drop("_cur")
            )
        vol = state.groupBy(*g, F.col("label").alias("c")).agg(
            F.sum("k").alias("vol")
        )
        keyed = cand.join(state, on=g + ["node_id"]).join(vol, on=g + ["c"])
        if g:
            keyed = keyed.join(F.broadcast(m2), on=g)
        else:
            keyed = keyed.crossJoin(F.broadcast(m2))
        key = (
            keyed.withColumn(
                "volx",
                F.col("vol")
                - F.when(F.col("c") == F.col("label"), F.col("k")).otherwise(F.lit(0)),
            )
            .withColumn(
                "gain_key",
                F.col("m2") * F.col("e") - F.col("k") * F.col("volx"),
            )
        )
        moved = key.groupBy(*g, "node_id").agg(
            F.expr("max_by(c, struct(gain_key, ~c))").alias("new_label"),
            F.min("k").alias("k"),
        )
        return moved.select(*g, "node_id", "k", F.col("new_label").alias("label"))

    final, _ = run_fixpoint(
        labels0,
        step,
        max_iterations=rounds,
        manager=manager,
        durable_checkpoint_every=durable_checkpoint_every,
        resume=resume,
    )
    und.unpersist()
    return final.select(*g, "node_id", "label")
