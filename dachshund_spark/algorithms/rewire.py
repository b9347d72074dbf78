"""Degree-preserving edge rewiring (configuration-model null graphs).

Motif significance (triangles, butterflies, four-cliques — all in this
engine) is measured against a degree-preserving null model: rewire the
observed graph by double-edge swaps (Maslov & Sneppen 2002) and compare
counts.  The classic sampler is sequential MCMC; this is the
synchronized, deterministic variant built for replay:

per round r (seeded):
1. every canonical edge (u < v) gets the key md5(seed#r#u#v) and a
   bucket = key % num_buckets; within its bucket, edges are ranked by
   (key, u, v) and paired consecutively (rank 1↔2, 3↔4, ...),
2. a pair ((a,b),(c,d)) proposes the swap → (a,d), (c,b), both
   re-canonicalized,
3. the pair is APPLIED only when the swap is valid under synchronized
   update: no self-loops, neither new edge already exists in the
   current edge set, and each new edge is proposed by exactly ONE pair
   this round (collision → both colliding pairs keep their originals),
4. next state = untouched edges + swapped pairs' new edges.

Every node's degree is invariant (each swap preserves the endpoint
multiset), the edge count is invariant, and the whole trace is
deterministic — the DuckDB oracle replays every round exactly.

Scale shape: per round, two bucket-partitioned windows (bucket count
is the parallelism dial — no global sort), one self-join for pairing,
two anti-join existence checks against the edge set, and one
proposed-edge uniqueness groupBy.  All shuffles are keyed on edges or
buckets; no collects, no driver loops beyond the round counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.iterate import run_fixpoint
from dachshund_spark.pipeline.text import md5_long
from dachshund_spark.util import gcols


def degree_preserving_swaps(
    graph: LinkGraph,
    *,
    rounds: int = 4,
    num_buckets: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Returns the rewired canonical edge set ``[graph_id?, src, dst]``
    (src < dst) after ``rounds`` synchronized swap rounds."""
    edges0 = graph.canonical_edges()
    g = gcols(edges0)

    def step(state: DataFrame, superstep: int) -> DataFrame:
        r = superstep + 1
        keyed = state.withColumn(
            "_key",
            md5_long(
                F.concat_ws(
                    "#", F.lit(seed), F.lit(r), F.col("src"), F.col("dst")
                )
            ),
        ).withColumn("_bkt", F.pmod("_key", F.lit(num_buckets)))
        w = Window.partitionBy(*g, "_bkt").orderBy("_key", "src", "dst")
        ranked = keyed.withColumn("_rn", F.row_number().over(w))
        left = ranked.where(F.col("_rn") % 2 == 1).select(
            *g,
            "_bkt",
            F.col("_rn").alias("_lrn"),
            F.col("src").alias("a"),
            F.col("dst").alias("b"),
        )
        right = ranked.where(F.col("_rn") % 2 == 0).select(
            *g,
            "_bkt",
            (F.col("_rn") - 1).alias("_lrn"),
            F.col("src").alias("c"),
            F.col("dst").alias("d"),
        )
        pairs = left.join(right, on=g + ["_bkt", "_lrn"]).select(
            *g,
            "a",
            "b",
            "c",
            "d",
            F.least(F.col("a"), F.col("d")).alias("n1s"),
            F.greatest(F.col("a"), F.col("d")).alias("n1d"),
            F.least(F.col("c"), F.col("b")).alias("n2s"),
            F.greatest(F.col("c"), F.col("b")).alias("n2d"),
        )
        # self-loops and degenerate (identical new edges) rejected here;
        # existence and uniqueness rejected below
        pairs = pairs.where(
            (F.col("a") != F.col("d"))
            & (F.col("c") != F.col("b"))
            & ~((F.col("n1s") == F.col("n2s")) & (F.col("n1d") == F.col("n2d")))
        )
        prop = pairs.select(
            *g, "a", "b", "c", "d", F.col("n1s").alias("ps"), F.col("n1d").alias("pd")
        ).unionByName(
            pairs.select(
                *g, "a", "b", "c", "d",
                F.col("n2s").alias("ps"), F.col("n2d").alias("pd"),
            )
        )
        # reject proposals whose new edge already exists
        exists = prop.join(
            state.select(*g, F.col("src").alias("ps"), F.col("dst").alias("pd")),
            on=g + ["ps", "pd"],
            how="left_semi",
        ).select(*g, "a", "b")
        # reject proposals colliding with another pair's new edge
        dup = (
            prop.groupBy(*g, "ps", "pd")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") >= 2)
        )
        collide = prop.join(dup, on=g + ["ps", "pd"], how="left_semi").select(
            *g, "a", "b"
        )
        bad = exists.unionByName(collide).distinct()
        ok = pairs.join(bad, on=g + ["a", "b"], how="left_anti")
        removed = ok.select(*g, F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
            ok.select(*g, F.col("c").alias("src"), F.col("d").alias("dst"))
        )
        added = ok.select(*g, F.col("n1s").alias("src"), F.col("n1d").alias("dst")).unionByName(
            ok.select(*g, F.col("n2s").alias("src"), F.col("n2d").alias("dst"))
        )
        return (
            state.join(removed, on=g + ["src", "dst"], how="left_anti")
            .unionByName(added)
            .select(*g, "src", "dst")
        )

    final, _ = run_fixpoint(edges0, step, max_iterations=rounds)
    return final


def motif_significance(
    graph: LinkGraph,
    *,
    rounds: int = 4,
    num_buckets: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Observed vs degree-preserving-null triangle counts:
    ``[graph_id?, observed_triangles, null_triangles, excess_ratio]``.

    The classic motif-significance readout: the configuration model
    keeps every degree, so any triangle excess over the rewired null is
    structure beyond the degree sequence (community/clustering signal;
    link farms score ≫ 1).  ``excess_ratio`` is a single IEEE division
    of the two exact counts — engine-stable, NULL when the null graph
    is triangle-free."""
    from dachshund_spark.algorithms.triangles import triangle_list

    g = gcols(graph.edges)
    null_graph = LinkGraph(
        degree_preserving_swaps(
            graph, rounds=rounds, num_buckets=num_buckets, seed=seed
        )
    )

    def _count(gr: LinkGraph, out: str) -> DataFrame:
        tris = triangle_list(gr, persist=False)
        if g:
            return tris.groupBy(*g).agg(F.count(F.lit(1)).alias(out))
        return tris.agg(F.count(F.lit(1)).alias(out))

    obs = _count(graph, "observed_triangles")
    nul = _count(null_graph, "null_triangles")
    joined = obs.join(nul, on=g, how="outer") if g else obs.crossJoin(nul)
    return joined.select(
        *g,
        F.coalesce("observed_triangles", F.lit(0)).alias("observed_triangles"),
        F.coalesce("null_triangles", F.lit(0)).alias("null_triangles"),
        F.when(
            F.coalesce("null_triangles", F.lit(0)) > 0,
            F.coalesce("observed_triangles", F.lit(0)).cast("double")
            / F.col("null_triangles").cast("double"),
        ).alias("excess_ratio"),
    )
