"""Gould-Fernandez brokerage roles, distributed.

Reference semantics (/root/reference/src/dachshund/algorithms/brokerage.rs:26-66):
for every open directed 2-path a→v→b — a ranges over in-neighbors, b
over out-neighbors, **no a≠b filter** (a mutual tie a⇄v yields the
open path a→v→a unless a→a exists), "open" = no direct a→b edge —
classify by the community pattern of (a, v, b):

- coordinator:     c(v)==c(a) and c(v)==c(b)
- itinerant:       c(v)!=c(a) and c(a)==c(b)
- gatekeeper:      c(v)!=c(a) and c(v)==c(b)
- representative:  c(v)==c(a) and c(v)!=c(b)
- liaison:         otherwise (all three distinct)

The reference probes per-node hash maps; here it's the J4 join pattern
(SURVEY.md §2.4): in-edges ⋈ out-edges on v, then a left_anti join
against the edge table to keep only open paths, then one aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.util import gcols

ROLES = ["coordinator", "itinerant", "gatekeeper", "representative", "liaison"]


def open_two_paths(graph: LinkGraph) -> DataFrame:
    """All open 2-paths: [g?, a, v, b] with edges a→v, v→b and no a→b."""
    e = graph.edges.distinct()
    g = gcols(e)
    in_e = e.select(*g, F.col("src").alias("a"), F.col("dst").alias("v"))
    out_e = e.select(*g, F.col("src").alias("v"), F.col("dst").alias("b"))
    paths = in_e.join(out_e, on=g + ["v"])
    closing = e.select(*g, F.col("src").alias("a"), F.col("dst").alias("b"))
    return paths.join(closing, on=g + ["a", "b"], how="left_anti")


def brokerage_scores(graph: LinkGraph, communities: DataFrame) -> DataFrame:
    """Per-node brokerage role counts.

    ``communities``: [g?, node_id, community]. Returns one row per node
    that appears in the graph, with the five role counts plus
    ``open_twopaths`` (zeros for non-brokers).
    """
    g = gcols(graph.edges)
    paths = open_two_paths(graph)

    def comm(alias: str) -> DataFrame:
        return communities.select(
            *g, F.col("node_id").alias(alias), F.col("community").alias(f"c_{alias}")
        )

    labeled = (
        paths.join(comm("a"), on=g + ["a"])
        .join(comm("v"), on=g + ["v"])
        .join(comm("b"), on=g + ["b"])
    )
    cv, ca, cb = F.col("c_v"), F.col("c_a"), F.col("c_b")
    role = (
        F.when((cv == ca) & (cv == cb), "coordinator")
        .when((cv != ca) & (ca == cb), "itinerant")
        .when((cv != ca) & (cv == cb), "gatekeeper")
        .when((cv == ca) & (cv != cb), "representative")
        .otherwise("liaison")
    )
    counts = (
        labeled.select(*g, F.col("v").alias("node_id"), role.alias("role"))
        .groupBy(*g, "node_id")
        .pivot("role", ROLES)
        .agg(F.count(F.lit(1)))
    )
    out = graph.nodes().join(counts, on=g + ["node_id"], how="left")
    zero = lambda c: F.coalesce(F.col(c), F.lit(0)).alias(c)  # noqa: E731
    out = out.select(*g, "node_id", *[zero(r) for r in ROLES])
    total = sum((F.col(r) for r in ROLES[1:]), F.col(ROLES[0]))
    return out.withColumn("open_twopaths", total)
