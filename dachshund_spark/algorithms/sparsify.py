"""Local-similarity graph sparsification (L-Spar; Satuluri, Parthasarathy
& Ruan, SIGMOD 2011).

Keeps, for every node u, its top-⌈deg(u)^{1/2}⌉ incident edges ranked
by neighbor-set Jaccard similarity; an edge survives when *either*
endpoint keeps it.  Clustering structure survives almost untouched
while inter-cluster noise edges drop out — the standard pre-pass that
makes community detection / label propagation affordable on web-scale
graphs (the reference has no sparsifier; its graphs are fixture-sized).

Determinism/exactness: Jaccard = t/(du+dv−t) with t the edge's
triangle support; edges are ranked by the scaled integer quotient
``(t·10^9) div union`` (identical truncating division in Spark and
DuckDB — a collision between fractions closer than 1e-9 is resolved by
the neighbor-id tie-break identically in both engines).  The keep
budget ⌈sqrt(d)⌉ uses IEEE sqrt, which is correctly rounded —
engine-stable, unlike ln/exp.

Scale shape: one triangle enumeration for support (degree-oriented
wedge join, O(m^1.5)), one degree join, and one per-node window over
incident edges (same hub-sized-partition profile as the h-index
coreness sort — a 10^6-degree hub is one in-memory sort, not a global
one).  No collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dachshund_spark.algorithms.scan import edge_similarity
from dachshund_spark.graph import LinkGraph
from dachshund_spark.util import gcols


def lspar_sparsify(graph: LinkGraph, *, min_keep: int = 1) -> DataFrame:
    """Sparsified canonical edge set ``[graph_id?, src, dst]``.

    ``min_keep`` floors the per-node budget (paper default 1 — every
    node keeps its most-similar edge, so no node is isolated)."""
    canon = edge_similarity(graph).select(*gcols(graph.edges), "src", "dst", "support")
    g = gcols(canon)
    deg = graph.degrees()
    e = canon.join(
        deg.select(*g, F.col("node_id").alias("src"), F.col("degree").alias("_du")),
        on=g + ["src"],
    ).join(
        deg.select(*g, F.col("node_id").alias("dst"), F.col("degree").alias("_dv")),
        on=g + ["dst"],
    )
    e = e.withColumn(
        "_key",
        F.expr("(support * 1000000000L) DIV (_du + _dv - support)"),
    )
    both = e.select(
        *g,
        F.col("src").alias("node"),
        F.col("dst").alias("nbr"),
        "src",
        "dst",
        "_key",
        F.col("_du").alias("_deg"),
    ).unionByName(
        e.select(
            *g,
            F.col("dst").alias("node"),
            F.col("src").alias("nbr"),
            "src",
            "dst",
            "_key",
            F.col("_dv").alias("_deg"),
        )
    )
    w = Window.partitionBy(*g, "node").orderBy(F.desc("_key"), F.asc("nbr"))
    budget = F.greatest(
        F.ceil(F.sqrt(F.col("_deg").cast("double"))), F.lit(int(min_keep))
    )
    kept = (
        both.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= budget)
        .select(*g, "src", "dst")
        .distinct()
    )
    return kept


def local_bridges(graph: LinkGraph) -> DataFrame:
    """Granovetter local bridges: canonical edges in NO triangle —
    ``[g?, src, dst, du, dv]`` (endpoint degrees attached so callers
    can separate pendant edges from true weak ties).

    An edge whose endpoints share no neighbor has span ≥ 3: deleting
    it pushes its endpoints' distance past 2, so these are the weak
    ties that carry long-range information flow ("The Strength of Weak
    Ties", 1973) — and, in a link graph, the inter-community edges
    every sparsifier must NOT drop (:func:`lspar_sparsify` keeps each
    node's top-√d by Jaccard, which preserves exactly these when they
    are a node's only edges).  Cost: the one degree-oriented triangle
    pass the engine already shares across the support family.
    """
    from dachshund_spark.algorithms.triangles import triangle_list
    from dachshund_spark.util import gcols

    g = gcols(graph.edges)
    canon = graph.canonical_edges()
    tris = triangle_list(graph, persist=False)
    pair = F.explode(
        F.array(
            F.struct(F.least("a", "b").alias("s"), F.greatest("a", "b").alias("d")),
            F.struct(F.least("a", "c").alias("s"), F.greatest("a", "c").alias("d")),
            F.struct(F.least("b", "c").alias("s"), F.greatest("b", "c").alias("d")),
        )
    )
    in_tri = (
        tris.select(*g, pair.alias("e"))
        .select(*g, F.col("e.s").alias("src"), F.col("e.d").alias("dst"))
        .distinct()
    )
    deg = graph.degrees()
    return (
        canon.join(in_tri, on=g + ["src", "dst"], how="left_anti")
        .join(
            deg.select(*g, F.col("node_id").alias("src"),
                       F.col("degree").alias("du")),
            on=g + ["src"],
        )
        .join(
            deg.select(*g, F.col("node_id").alias("dst"),
                       F.col("degree").alias("dv")),
            on=g + ["dst"],
        )
        .select(*g, "src", "dst", F.col("du").cast("long").alias("du"),
                F.col("dv").cast("long").alias("dv"))
    )
