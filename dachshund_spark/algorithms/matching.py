"""Distributed greedy maximal matching (Luby-style local minima).

Dachshund has no matching primitive; at web scale a maximal matching
is the workhorse of multilevel graph coarsening (METIS-style
contraction) and of degree-constrained sampling.  The classic
parallelization (Israeli & Itai 1986 / Luby's technique): give every
edge a random priority; an edge joins the matching iff its priority is
the MINIMUM among all edges incident to BOTH endpoints — locally
checkable, so each round is two grouped mins + one join, and matched
endpoints drop out.  Expected O(log m) rounds (8 on the 57k-edge
fixture).

Priorities are md5-derived, so the entire run is deterministic and the
DuckDB oracle replays it exactly (the md5 bigint is unique per edge
with overwhelming probability — ties would only merge identical
priorities, which the fixtures don't have and 2^60 keyspace makes
negligible; a tie simply drops both candidates to the next round, in
both engines identically, because neither passes BOTH endpoint-min
checks... it does pass — so priorities double as the tie-break key).

Result is maximal (no augmentable edge remains), not maximum — the
standard trade for O(log m) parallel rounds vs sequential augmenting
paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.pipeline.text import md5_long
from dachshund_spark.util import gcols


def maximal_matching(
    graph: LinkGraph, *, max_rounds: int = 64, seed: int = 0
) -> DataFrame:
    """Matched edges ``[g?, u, v, priority]`` (u < v), a maximal
    matching of the simple undirected graph.  ``max_rounds`` is a
    safety budget; the loop exits when no candidate edges remain."""
    g = gcols(graph.edges)
    edges = graph.canonical_edges().select(
        *g,
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        md5_long(
            F.concat_ws("#", F.lit(seed), F.lit("m"), F.col("src"), F.col("dst"))
        ).alias("p"),
    ).localCheckpoint(eager=True)
    picked: list[DataFrame] = []
    for _ in range(max_rounds):
        if edges.isEmpty():
            break
        # per-NODE minimum across BOTH endpoint roles — grouping by the
        # u / v columns separately would let two edges sharing a node
        # both pass (each a "minimum" of its own side)
        inc = edges.select(*g, F.col("u").alias("node_id"), "p").unionByName(
            edges.select(*g, F.col("v").alias("node_id"), "p")
        )
        nmin = inc.groupBy(*g, "node_id").agg(F.min("p").alias("pm"))
        sel = (
            edges.join(
                nmin.select(*g, F.col("node_id").alias("u"), F.col("pm").alias("pu")),
                on=g + ["u"],
            )
            .join(
                nmin.select(*g, F.col("node_id").alias("v"), F.col("pm").alias("pv")),
                on=g + ["v"],
            )
            .where((F.col("p") == F.col("pu")) & (F.col("p") == F.col("pv")))
            .select(*g, "u", "v", "p")
            .localCheckpoint(eager=True)
        )
        if sel.isEmpty():
            break
        picked.append(sel)
        gone = sel.select(*g, F.col("u").alias("node_id")).unionByName(
            sel.select(*g, F.col("v").alias("node_id"))
        )
        edges = (
            edges.join(
                gone.select(*g, F.col("node_id").alias("u")),
                on=g + ["u"],
                how="left_anti",
            )
            .join(
                gone.select(*g, F.col("node_id").alias("v")),
                on=g + ["v"],
                how="left_anti",
            )
            .localCheckpoint(eager=True)
        )
    if not picked:
        return edges.select(*g, "u", "v", F.col("p").alias("priority")).limit(0)
    out = picked[0]
    for fr in picked[1:]:
        out = out.unionByName(fr)
    return out.select(*g, "u", "v", F.col("p").alias("priority"))


def coarsen_by_matching(
    graph: LinkGraph, *, max_rounds: int = 64, seed: int = 0
) -> tuple[DataFrame, DataFrame]:
    """One multilevel-coarsening step (METIS-style heavy-edge
    contraction, uniform weights): returns ``(mapping, coarse_edges)``.

    ``mapping`` is ``[g?, node_id, super]`` — each matched pair
    collapses into its lower endpoint, unmatched nodes map to
    themselves (≥ half the nodes with any edge are matched, so one
    level roughly halves the graph).  ``coarse_edges`` is
    ``[g?, u, v, weight]`` with u < v: original edges re-keyed through
    the mapping, intra-pair edges dropped, parallel edges merged with
    ``weight`` = how many originals they represent — exactly the
    invariant a multilevel partitioner needs (coarse cut weight ==
    fine cut weight).  Cost beyond the matching: two mapping joins +
    one grouped count.
    """
    g = gcols(graph.edges)
    matched = maximal_matching(graph, max_rounds=max_rounds, seed=seed)
    nodes = graph.nodes()
    pair_map = matched.select(
        *g, F.col("u").alias("node_id"), F.col("u").alias("super")
    ).unionByName(
        matched.select(*g, F.col("v").alias("node_id"), F.col("u").alias("super"))
    )
    mapping = (
        nodes.join(pair_map, on=g + ["node_id"], how="left")
        .select(
            *g, "node_id", F.coalesce("super", F.col("node_id")).alias("super")
        )
    )
    canon = graph.canonical_edges()
    remapped = (
        canon.join(
            mapping.select(*g, F.col("node_id").alias("src"), F.col("super").alias("_su")),
            on=g + ["src"],
        )
        .join(
            mapping.select(*g, F.col("node_id").alias("dst"), F.col("super").alias("_sv")),
            on=g + ["dst"],
        )
        .where(F.col("_su") != F.col("_sv"))
        .select(
            *g,
            F.least("_su", "_sv").alias("u"),
            F.greatest("_su", "_sv").alias("v"),
        )
    )
    coarse = remapped.groupBy(*g, "u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("weight")
    )
    return mapping, coarse


def vertex_cover_2approx(graph: LinkGraph, **matching_kwargs) -> DataFrame:
    """Matched-endpoints vertex cover ``[graph_id?, node_id, partner]``
    — both endpoints of a maximal matching (Gavril/Yannakakis): every
    edge touches the cover (else the matching wasn't maximal), and the
    cover is ≤ 2·OPT since any cover must hit each matched edge.
    Inherits :func:`maximal_matching`'s determinism and scale shape."""
    m = maximal_matching(graph, **matching_kwargs)
    g = [c for c in m.columns if c == "graph_id"]
    return m.select(
        *g, F.col("u").alias("node_id"), F.col("v").alias("partner")
    ).unionByName(
        m.select(*g, F.col("v").alias("node_id"), F.col("u").alias("partner"))
    )
