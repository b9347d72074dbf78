"""TrustRank / spam-mass estimation over a link graph.

Gyöngyi, Garcia-Molina & Pedersen, "Combating Web Spam with TrustRank"
(VLDB 2004) and "Link Spam Detection Based on Mass Estimation"
(VLDB 2006): TrustRank is personalized PageRank whose teleport vector
is uniform over a hand-verified trusted seed set; the *relative spam
mass* of a page is the fraction of its PageRank not attributable to
the trusted core, (PR(p) − TR(p)) / PR(p).  Pages with high PageRank
but high spam mass earn their rank from outside the trust
neighborhood — the classic link-spam signal.

Both ranks come from the existing fixpoint machinery
(:func:`dachshund_spark.algorithms.pagerank.pagerank`), so salting,
checkpoint/resume, bucketed-CSR edges, and the superstep stats barrier
all apply unchanged; this module is composition plus one per-row
expression.  The two rank columns are rounded to 8 decimals BEFORE the
ratio so the spam-mass expression is a deterministic function of
oracle-stable inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.util import gcols


def trust_rank(
    graph: LinkGraph, trusted: list[int], **pagerank_kwargs
) -> DataFrame:
    """Personalized PageRank with the teleport vector restricted to the
    trusted seed set: ``[graph_id?, node_id, trustrank]``."""
    from dachshund_spark.algorithms.pagerank import pagerank

    tr = pagerank(graph, personalization=trusted, **pagerank_kwargs)
    return tr.withColumnRenamed("pagerank", "trustrank")


def spam_mass(
    graph: LinkGraph, trusted: list[int], **pagerank_kwargs
) -> DataFrame:
    """``[graph_id?, node_id, pagerank, trustrank, spam_mass]`` where
    spam_mass = (PR − TR) / PR on the raw ranks, rounded to 8 decimals
    for output (rank columns likewise rounded for display).

    PR is strictly positive (the (1−d)/n teleport floor), so the ratio
    is always defined.  Cost: two independent fixpoints over the same
    cached edge table + one join — the join shuffles on node_id, the
    same key both fixpoints already end on.
    """
    from dachshund_spark.algorithms.pagerank import pagerank

    g = gcols(graph.edges)
    pr = pagerank(graph, **pagerank_kwargs).select(
        *g, "node_id", F.col("pagerank").alias("_pr")
    )
    tr = pagerank(graph, personalization=trusted, **pagerank_kwargs).select(
        *g, "node_id", F.col("pagerank").alias("_tr")
    )
    # the ratio is computed on the RAW ranks (PR's (1-d)/n teleport
    # floor keeps it defined at ANY n); the 8-decimal rounding is
    # display/oracle-stability only — rounding first would zero the
    # floor past ~3e7 nodes and turn the whole low-rank tail into NaN
    return pr.join(tr, on=g + ["node_id"]).select(
        *g,
        "node_id",
        F.round("_pr", 8).alias("pagerank"),
        F.round("_tr", 8).alias("trustrank"),
        F.round(
            (F.col("_pr") - F.col("_tr")) / F.col("_pr"), 8
        ).alias("spam_mass"),
    )
