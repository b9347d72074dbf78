"""Snapshot delta between two crawls of a link graph.

A recrawl of the web produces a new edge table; the per-page link
churn (how many out-links appeared/disappeared, how stable the
adjacency is) drives recrawl scheduling and freshness scoring (Cho &
Garcia-Molina, "The Evolution of the Web and Implications for an
Incremental Crawler", VLDB 2000).  The reference has no temporal
notion; this is a north-rule addition for the 10^12-doc pipeline where
"the crawl" is always really two crawls mid-swap.

Shape: both sides deduped, then ONE full-outer join on (src, dst) —
the natural shuffle key — and one groupBy(src).  No fixpoint, no
window; skew is bounded by per-page out-degree (capped in any real
crawl extractor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.util import gcols


def snapshot_delta(old_edges: DataFrame, new_edges: DataFrame) -> DataFrame:
    """Per-source link churn between two directed edge snapshots:
    ``[graph_id?, src, n_added, n_removed, n_stable, jaccard]``.

    jaccard = |old ∩ new| / |old ∪ new| over the node's out-link sets
    (a single integer division — oracle-exact).  Sources present in
    only one snapshot appear with n_added or n_removed equal to their
    out-degree and jaccard 0.
    """
    g = gcols(old_edges)
    o = old_edges.select(*g, "src", "dst").distinct().withColumn(
        "_in_old", F.lit(1)
    )
    n = new_edges.select(*g, "src", "dst").distinct().withColumn(
        "_in_new", F.lit(1)
    )
    both = o.join(n, on=g + ["src", "dst"], how="full_outer")
    added = (F.col("_in_old").isNull() & F.col("_in_new").isNotNull()).cast("long")
    removed = (F.col("_in_old").isNotNull() & F.col("_in_new").isNull()).cast("long")
    stable = (F.col("_in_old").isNotNull() & F.col("_in_new").isNotNull()).cast("long")
    return (
        both.groupBy(*g, "src")
        .agg(
            F.sum(added).cast("long").alias("n_added"),
            F.sum(removed).cast("long").alias("n_removed"),
            F.sum(stable).cast("long").alias("n_stable"),
        )
        .select(
            *g,
            "src",
            "n_added",
            "n_removed",
            "n_stable",
            (
                F.col("n_stable")
                / (
                    F.col("n_added") + F.col("n_removed") + F.col("n_stable")
                ).cast("double")
            ).alias("jaccard"),
        )
    )
