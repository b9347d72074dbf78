"""Clique percolation (CPM, k = 3): overlapping communities.

Palla et al. 2005 — a k-clique community is a maximal union of k-cliques
reachable through (k−1)-clique overlaps.  For k = 3 that is: triangles
are nodes of an *overlap graph* with an edge between two triangles that
share a graph edge; communities are the connected components of that
overlap graph, and each graph vertex belongs to every community whose
triangles contain it (so membership OVERLAPS, unlike LPA/CNM/Louvain).

Scale shape (100-TB story):
- triangle enumeration is the degree-oriented O(m^1.5) pass already
  used by :func:`triangle_list` — no new shuffle pattern;
- triangles sharing an edge are CHAIN-linked (sorted by triangle id,
  lag window per edge key), not all-paired: an edge lying in T
  triangles contributes T−1 overlap edges instead of T·(T−1)/2, which
  is what keeps hub edges from exploding the overlap graph;
- the component closure reuses the hash-min CC fixpoint (materialized
  supersteps, stats barrier) over the overlap graph.

Semantics parity: the reference has no CPM; this is an engine addition
in the same family as its community operators (CNM at
/root/reference/src/dachshund/algorithms/cnm_communities.rs — CPM is
the overlapping counterpart).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dachshund_spark.algorithms.components import connected_components
from dachshund_spark.algorithms.triangles import triangle_list
from dachshund_spark.graph import LinkGraph
from dachshund_spark.util import gcols


def _packed_triangle_ids(graph: LinkGraph, tris: DataFrame) -> DataFrame:
    """Canonically ordered triangles with a collision-free packed id.

    The shift is computed from the observed max node id (not a magic
    constant — the bridges() 2^20 pitfall), and asserted to fit a
    BIGINT: 3 · bits(max_id) ≤ 62.
    """
    mx = graph.edges.agg(
        F.max(F.greatest(F.col("src"), F.col("dst")))
    ).first()[0]
    bits = max(int(mx).bit_length(), 1)
    if 3 * bits > 62:
        raise ValueError(
            f"node ids up to {mx} need {bits} bits each; packed triangle ids "
            "would overflow BIGINT — remap ids densely first"
        )
    g = gcols(tris)
    scale = 1 << bits
    t = (
        tris.select(
            *g,
            "a",
            "b",
            "c",
            F.least("a", "b", "c").alias("u"),
            F.greatest("a", "b", "c").alias("w"),
        )
        .withColumn(
            "v", F.col("a") + F.col("b") + F.col("c") - F.col("u") - F.col("w")
        )
        .select(
            *g,
            "u",
            "v",
            "w",
            (
                (F.col("u") * F.lit(scale) + F.col("v")) * F.lit(scale) + F.col("w")
            ).alias("tid"),
        )
    )
    return t


def clique_percolation(
    graph: LinkGraph,
    *,
    max_iterations: int = 50,
    join_hint: str | None = None,
) -> DataFrame:
    """k = 3 clique-percolation communities.

    Returns ``[graph_id?, community, node_id]`` — one row per
    (community, member) pair; a vertex in triangles of several
    communities appears once per community (overlapping membership).
    ``community`` is the smallest packed triangle id in the community
    (scale-stable label, no global renumber).  Vertices in no triangle
    are absent, per CPM semantics.
    """
    g = gcols(graph.edges)
    t = _packed_triangle_ids(graph, triangle_list(graph)).persist()

    # one row per (edge of the triangle, triangle): the overlap key
    edge_member = t.select(
        *g,
        "tid",
        F.explode(
            F.array(
                F.struct(F.col("u").alias("es"), F.col("v").alias("ed")),
                F.struct(F.col("u").alias("es"), F.col("w").alias("ed")),
                F.struct(F.col("v").alias("es"), F.col("w").alias("ed")),
            )
        ).alias("e"),
    ).select(*g, F.col("e.es").alias("es"), F.col("e.ed").alias("ed"), "tid")

    # chain-link triangles sharing an edge (sorted by tid): same
    # connectivity as the full pairwise clique, linear in T per edge
    wnd = Window.partitionBy(*g, "es", "ed").orderBy("tid")
    prev = F.lag("tid").over(wnd)
    overlap_edges = (
        edge_member.withColumn("prev", prev)
        .where(F.col("prev").isNotNull())
        .select(*g, F.col("prev").alias("src"), F.col("tid").alias("dst"))
    )

    tid_nodes = t.select(*g, F.col("tid").alias("node_id")).distinct()
    comp = connected_components(
        LinkGraph(overlap_edges),
        nodes=tid_nodes,
        renumber=False,
        max_iterations=max_iterations,
        join_hint=join_hint,
    )

    members = t.select(
        *g, "tid", F.explode(F.array("u", "v", "w")).alias("node_id")
    )
    out = (
        members.join(
            comp.select(*g, F.col("node_id").alias("tid"), "component"),
            on=g + ["tid"],
        )
        .select(*g, F.col("component").alias("community"), "node_id")
        .distinct()
    )
    return out


def cpm_community_sizes(communities: DataFrame) -> DataFrame:
    """[graph_id?, community, size] from :func:`clique_percolation`."""
    g = gcols(communities)
    return communities.groupBy(*g, "community").agg(
        F.count("*").alias("size")
    )
