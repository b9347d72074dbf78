"""Borůvka minimum spanning forest as DataFrame supersteps.

Dachshund has no MSF; it is the standard bulk-parallel spanning-forest
algorithm (O(log n) rounds) and the backbone of distributed
single-linkage clustering (an MSF over an embedding-similarity graph,
cut at a distance threshold, IS single-linkage — the scale path for
agglomerative dedup clustering).

Determinism contract: edges are totally ordered by the struct
``(weight, src, dst)`` over canonical (src < dst) endpoints.  Under a
total order the minimum spanning forest is UNIQUE, so the output is
algorithm-independent and exactly reproducible by any engine — the
driver oracle replays the same rounds in DuckDB and must match edge for
edge.

Round shape (all JVM-side, partial-aggregated, hub-safe):
1. label cross-component edges (two joins against the node→component
   map), drop intra-component edges;
2. per component, pick the minimum incident cross edge — one
   ``min_by(struct)`` aggregation (map-side combinable);
3. contract: each component points at its chosen edge's other
   component; the only cycles in that functional graph are mutual
   2-cycles at each merge group's lightest edge (weights strictly
   decrease around any longer cycle, impossible under a total order),
   broken by rooting at the smaller label; then pointer DOUBLING
   (p ← p∘p, a self-join per step) flattens merge chains in
   O(log depth) steps — never O(depth) hash-min rounds;
4. accumulate the chosen edges into the forest and relabel nodes.

Terminates when no cross-component edge remains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.iterate import _stats_barrier
from dachshund_spark.util import gcols


def _ckpt(df: DataFrame) -> DataFrame:
    return _stats_barrier(df.localCheckpoint(eager=True))


def boruvka_msf(
    graph: LinkGraph,
    weight_col: str,
    *,
    max_rounds: int = 32,
    max_doubling: int = 48,
) -> DataFrame:
    """Returns the minimum spanning forest ``[graph_id?, src, dst, wt]``
    (canonical ``src < dst`` rows, one per forest edge).

    ``weight_col`` must be present on ``graph.edges`` (declare it via
    ``LinkGraph(df, extra_cols=[...])``).  Parallel (duplicate) edges
    collapse to their minimum weight before the rounds start.
    """
    und = graph.weighted_undirected_edges(weight_col, agg="min")
    g = gcols(und)
    # canonical edge table with the total-order key folded in once
    canon = _ckpt(
        und.where(F.col("src") < F.col("dst")).select(
            *g, "src", "dst", F.col(weight_col).cast("double").alias("wt")
        )
    )
    labels = _ckpt(
        graph.nodes().withColumn("comp", F.col("node_id"))
    )
    forest = None

    for _round in range(max_rounds):
        lsrc = labels.select(*g, F.col("node_id").alias("src"), F.col("comp").alias("cu"))
        ldst = labels.select(*g, F.col("node_id").alias("dst"), F.col("comp").alias("cv"))
        cross = _ckpt(
            canon.join(lsrc, on=g + ["src"]).join(ldst, on=g + ["dst"]).where(
                F.col("cu") != F.col("cv")
            )
        )
        if cross.limit(1).count() == 0:
            break
        # per component: minimum incident cross edge under (wt, src, dst)
        key = F.struct(
            F.col("wt").alias("w"), F.col("src").alias("s"), F.col("dst").alias("d")
        )
        both = cross.select(
            *g, F.col("cu").alias("comp"), F.col("cv").alias("other"), key.alias("k")
        ).unionByName(
            cross.select(
                *g, F.col("cv").alias("comp"), F.col("cu").alias("other"), key.alias("k")
            )
        )
        chosen = _ckpt(
            both.groupBy(*g, "comp").agg(
                F.min_by("other", "k").alias("target"),
                F.min("k").alias("edge"),
            )
        )
        picked = chosen.select(
            *g,
            F.col("edge.s").alias("src"),
            F.col("edge.d").alias("dst"),
            F.col("edge.w").alias("wt"),
        ).distinct()
        forest = picked if forest is None else forest.unionByName(picked)
        forest = _ckpt(forest.distinct())

        # contraction: break mutual 2-cycles at the smaller label, then
        # pointer-double to the root
        t2 = chosen.select(
            *g, F.col("comp").alias("target"), F.col("target").alias("t2")
        )
        parent = _ckpt(
            chosen.join(t2, on=g + ["target"], how="left").select(
                *g,
                "comp",
                F.when(
                    (F.col("t2") == F.col("comp"))
                    & (F.col("comp") < F.col("target")),
                    F.col("comp"),
                )
                .otherwise(F.col("target"))
                .alias("parent"),
            )
        )
        for _ in range(max_doubling):
            gp = parent.select(
                *g, F.col("comp").alias("parent"), F.col("parent").alias("gp")
            )
            doubled = _ckpt(
                parent.join(gp, on=g + ["parent"], how="left").select(
                    *g, "comp", F.coalesce("gp", "parent").alias("parent")
                )
            )
            changed = (
                doubled.withColumnRenamed("parent", "np")
                .join(parent, on=g + ["comp"])
                .where(F.col("np") != F.col("parent"))
                .limit(1)
                .count()
            )
            parent = doubled
            if changed == 0:
                break
        # relabel every node to its component's new root (components
        # without a cross edge this round keep their label)
        labels = _ckpt(
            labels.join(parent, on=g + ["comp"], how="left").select(
                *g, "node_id", F.coalesce("parent", "comp").alias("comp")
            )
        )

    if forest is None:
        schema = g + ["src", "dst", "wt"]
        empty = canon.select(*schema).limit(0)
        return empty
    return forest
