"""SimRank structural similarity (Jeh & Widom, KDD 2002).

``s(a,b) = C / (|I(a)||I(b)|) · Σ_{i∈I(a), j∈I(b)} s(i,j)`` with
``s(a,a) = 1`` — two pages are similar when similar pages link to
them.  The recursive companion to co-citation: co-citation counts
shared in-neighbors once, SimRank propagates similarity through the
whole in-link graph.

This is the exact all-pairs form: the state is O(n²) pairs, so use it
on bounded subgraphs (the ``*_64`` driver-query convention —
ego-nets, per-community slices).  Production-scale SimRank is
approximated by random-walk sampling (Monte-Carlo meeting times) over
:mod:`dachshund_spark.walks`-style walk corpora; the exact form here
is the oracle those approximations are judged against.

Fixed-point arithmetic: scores are carried as 1e-10-scaled BIGINTs.
The per-pair sum Σ s(i,j) can span thousands of terms on a dense
subgraph, and a float sum that long drifts ~1e-13 — enough to flip a
ROUND(x, 8) at the boundary between engines.  Integer state makes the
sum exact; the only float op per pair per superstep is one
multiplication by C/(|I(a)||I(b)|) followed by one ROUND, which is
bit-stable across engines (identical expression trees, no libm — see
CLAUDE.md parity notes).

Superstep shape: two edge joins (i→a, j→b) + one (a,b) aggregation +
one in-degree normalization join, state materialized per superstep via
run_fixpoint.  Zero pairs are dropped — the state stays sparse on
sparse graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.iterate import run_fixpoint
from dachshund_spark.util import gcols

E10 = 10_000_000_000


def simrank(
    graph: LinkGraph,
    *,
    decay: float = 0.75,
    fixed_iterations: int = 5,
    dedupe_edges: bool = True,
) -> DataFrame:
    """All-pairs SimRank ``[node_a, node_b, simrank_e10]`` for
    ``node_a < node_b`` with nonzero similarity (``simrank_e10`` is the
    score scaled by 1e10 as an exact BIGINT; the diagonal is 1 by
    definition and omitted).

    ``decay`` defaults to 0.75 (exactly representable — the customary
    0.8 is not, and an inexact literal breaks cross-engine float
    parity; ranking behavior is indistinguishable).
    """
    if gcols(graph.edges):
        raise ValueError("simrank is single-graph only (O(n^2) pair state)")
    if not 0.0 < decay < 1.0:
        raise ValueError("decay must be in (0, 1)")
    edges = graph.edges.select("src", "dst")
    if dedupe_edges:
        edges = edges.distinct()
    edges = edges.persist()
    nodes = graph.nodes()
    indeg = edges.groupBy(F.col("dst").alias("node_id")).agg(
        F.count(F.lit(1)).alias("ind")
    )
    diag = nodes.select(
        F.col("node_id").alias("a"),
        F.col("node_id").alias("b"),
        F.lit(E10).cast("long").alias("s"),
    )

    def step(state: DataFrame, superstep: int) -> DataFrame:
        prev = state.select(
            F.col("a").alias("i"), F.col("b").alias("j"), "s"
        )
        ea = edges.select(F.col("src").alias("i"), F.col("dst").alias("a"))
        eb = edges.select(F.col("src").alias("j"), F.col("dst").alias("b"))
        summed = (
            prev.join(ea, on="i")
            .join(eb, on="j")
            .groupBy("a", "b")
            .agg(F.sum("s").alias("_sum"))
        )
        offdiag = (
            summed.where(F.col("a") != F.col("b"))
            .join(indeg.select(F.col("node_id").alias("a"),
                               F.col("ind").alias("ia")), on="a")
            .join(indeg.select(F.col("node_id").alias("b"),
                               F.col("ind").alias("ib")), on="b")
            .select(
                "a",
                "b",
                F.round(
                    (F.lit(float(decay)) / (F.col("ia") * F.col("ib")))
                    * F.col("_sum"),
                    0,
                )
                .cast("long")
                .alias("s"),
            )
            .where(F.col("s") > 0)
        )
        return diag.unionByName(offdiag)

    final, _ = run_fixpoint(diag, step, converged=None,
                            max_iterations=fixed_iterations)
    edges.unpersist()
    return final.where(F.col("a") < F.col("b")).select(
        F.col("a").alias("node_a"),
        F.col("b").alias("node_b"),
        F.col("s").alias("simrank_e10"),
    )
