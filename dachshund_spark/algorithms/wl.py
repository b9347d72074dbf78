"""Weisfeiler-Lehman refinement labels and graph fingerprints.

1-WL color refinement (Weisfeiler & Lehman 1968; graph-kernel form
Shervashidze et al., JMLR 2011): start from degree labels and
repeatedly hash each node's (own label, neighborhood multiset).  Equal
final label multisets ⇒ graphs 1-WL-equivalent (isomorphic graphs
always hash equal; distinguishes almost all non-isomorphic graphs).
Use it to dedup / bucket the *structure* of millions of small graphs
in a multi-graph frame (the reference processes batches of per-key
graphs — /root/reference/src/dachshund/transformer_base.rs:58-77 —
but has no structural fingerprint).

Determinism at scale: the neighborhood multiset is folded as a SUM of
per-neighbor label hashes reduced mod 2^40 — commutative, so
aggregation order can't matter, ANSI-overflow-safe to ~8M neighbors,
and exactly replayable in any SQL engine (same trick as the clique
checksum, /root/reference/src/dachshund/candidate.rs:173-184).

Scale shape: one edges join + groupBy per round, one final per-graph
sum.  No sorted-list collections (the textbook sorted-multiset concat
dies on hubs); no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.pipeline.text import md5_long
from dachshund_spark.util import gcols

_MOD = 1 << 40


def wl_labels(graph: LinkGraph, *, rounds: int = 3) -> DataFrame:
    """Per-node refined labels ``[graph_id?, node_id, wl_label]``."""
    g = gcols(graph.edges)
    und = graph.undirected_edges()
    labels = graph.degrees().select(
        *g, "node_id", md5_long(F.concat_ws("#", F.lit("d"), "degree")).alias("wl")
    )
    for _ in range(int(rounds)):
        nbr = (
            und.join(
                labels.select(*g, F.col("node_id").alias("dst"), "wl"),
                on=g + ["dst"],
            )
            .groupBy(*g, F.col("src").alias("node_id"))
            .agg(F.sum(F.pmod("wl", F.lit(_MOD))).alias("_ns"))
        )
        labels = (
            labels.join(nbr, on=g + ["node_id"])
            .select(
                *g,
                "node_id",
                md5_long(F.concat_ws("#", "wl", "_ns")).alias("wl"),
            )
        )
    return labels.withColumnRenamed("wl", "wl_label")


def wl_graph_hash(graph: LinkGraph, *, rounds: int = 3) -> DataFrame:
    """Per-graph structural fingerprint
    ``[graph_id?, n_nodes, n_edges, wl_hash]`` — equal for isomorphic
    graphs regardless of node ids."""
    g = gcols(graph.edges)
    labels = wl_labels(graph, rounds=rounds)
    canon = graph.canonical_edges()
    node_agg = labels.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.pmod("wl_label", F.lit(_MOD))).alias("wl_hash"),
    )
    edge_agg = canon.groupBy(*g).agg(F.count(F.lit(1)).alias("n_edges"))
    out = node_agg.join(edge_agg, on=g) if g else node_agg.crossJoin(edge_agg)
    return out.select(*g, "n_nodes", "n_edges", "wl_hash")
