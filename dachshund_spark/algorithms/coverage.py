"""Greedy maximum-coverage seed selection over out-neighborhoods.

The crawl/influence-seeding primitive (Nemhauser et al. 1978 greedy,
(1 − 1/e)-approximate): pick k nodes whose closed out-neighborhoods
cover the most nodes, one argmax at a time.  Dachshund has no
counterpart; this is an engine addition for crawl-frontier seeding
(pick the k hubs that reach the most uncrawled pages).

The greedy argmax is inherently sequential in k; each round is one
distributed semi/anti-join + count aggregate with a single-row
driver handoff (the double_sweep / crawl_budget scalar-pick
precedent) — k·O(|E|) total work, never a materialized power set.
Ties break to the smallest node id, so the pick sequence is exactly
replayable in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph

__all__ = ["greedy_max_coverage"]


def greedy_max_coverage(graph: LinkGraph, *, k: int = 6) -> DataFrame:
    """Returns ``[round, seed, gain, covered_total]`` — one row per
    greedy pick: the chosen seed, how many NEW nodes its closed
    out-neighborhood covered, and the cumulative covered count.

    Picks continue through zero-gain rounds (fixed k rows, smallest
    uncovered... smallest unpicked id wins ties) so the output shape is
    round-count deterministic for oracle replay.
    """
    spark = graph.edges.sparkSession
    cov = (
        graph.edges.select("src", "dst")
        .unionByName(
            graph.nodes().select(
                F.col("node_id").alias("src"), F.col("node_id").alias("dst")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    seeds: list[int] = []
    rows = []
    covered_total = 0
    for r in range(1, int(k) + 1):
        if seeds:
            sdf = spark.createDataFrame([(s,) for s in seeds], "src long")
            covered = cov.join(F.broadcast(sdf), on="src").select("dst").distinct()
            cand = cov.join(F.broadcast(sdf.select(F.col("src"))), on="src", how="left_anti")
        else:
            covered = None
            cand = cov
        fresh = (
            cand.join(covered, on="dst", how="left_anti") if covered is not None else cand
        )
        gains = fresh.groupBy("src").agg(F.count(F.lit(1)).alias("gain"))
        pick = (
            gains.orderBy(F.desc("gain"), F.asc("src")).limit(1).collect()
        )
        if not pick:
            # every remaining candidate has zero uncovered reach: pick
            # the smallest unpicked node with gain 0 (fixed-shape output)
            pick_row = (
                cand.select("src").distinct().orderBy("src").limit(1).collect()
            )
            if not pick_row:
                break
            seed, gain = int(pick_row[0]["src"]), 0
        else:
            seed, gain = int(pick[0]["src"]), int(pick[0]["gain"])
        seeds.append(seed)
        covered_total += gain
        rows.append((r, seed, gain, covered_total))
    return spark.createDataFrame(
        rows, "round long, seed long, gain long, covered_total long"
    )
