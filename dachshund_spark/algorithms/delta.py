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


def recrawl_intervals(
    snapshots: list[DataFrame],
    *,
    intervals: tuple[int, ...] = (30, 7, 1),
) -> DataFrame:
    """Change-rate-driven recrawl scheduling (Cho & Garcia-Molina 2003,
    "Effective page refresh policies for web crawlers"): pages whose
    out-link set churns every observed snapshot get the shortest
    recrawl interval; never-changing pages the longest.

    Each snapshot's per-page out-link set is reduced to an
    order-independent integer fingerprint (sum of dst md5-hashes mod
    2^40 over DISTINCT dst + out-degree — the reference's clique
    checksum trick, /root/reference/src/dachshund/candidate.rs:173-184),
    so "changed between consecutive snapshots" is one integer
    comparison per pair; a page absent from a snapshot carries the
    sentinel (-1, 0).  ``intervals[c]`` maps c observed changes →
    recrawl interval in days.

    Output: ``[src, n_changes, recrawl_days]``.

    Scale shape: one distinct + one groupBy per snapshot (map-side
    combinable), then k-1 equi-joins on the page key — never an
    all-pairs set comparison; fingerprints make snapshot diffs O(pages)
    instead of O(edges) at the scheduler.
    """
    from dachshund_spark.pipeline.text import md5_long

    fps = []
    for i, s in enumerate(snapshots):
        d = s.select("src", "dst").distinct()
        fps.append(
            d.groupBy("src").agg(
                F.sum(
                    F.pmod(md5_long(F.col("dst").cast("string")), F.lit(1 << 40))
                )
                .cast("long")
                .alias(f"fp{i}"),
                F.count(F.lit(1)).cast("long").alias(f"od{i}"),
            )
        )
    uni = fps[0].select("src")
    for f in fps[1:]:
        uni = uni.unionByName(f.select("src"))
    out = uni.distinct()
    for i, f in enumerate(fps):
        out = out.join(f, on="src", how="left").withColumn(
            f"fp{i}", F.coalesce(F.col(f"fp{i}"), F.lit(-1))
        ).withColumn(f"od{i}", F.coalesce(F.col(f"od{i}"), F.lit(0)))
    change_terms = [
        (
            (F.col(f"fp{i}") != F.col(f"fp{i+1}"))
            | (F.col(f"od{i}") != F.col(f"od{i+1}"))
        ).cast("long")
        for i in range(len(snapshots) - 1)
    ]
    n_changes = change_terms[0]
    for t in change_terms[1:]:
        n_changes = n_changes + t
    mapping = F.array(*[F.lit(int(x)) for x in intervals])
    return out.select(
        "src",
        n_changes.alias("n_changes"),
        F.element_at(mapping, n_changes.cast("int") + 1)
        .cast("long")
        .alias("recrawl_days"),
    )
