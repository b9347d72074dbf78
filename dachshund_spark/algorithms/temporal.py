"""Temporal (time-respecting) reachability.

A temporal edge (u, v, t) can be traversed only at its timestamp, and
a journey must use non-decreasing times: v is reachable from the seed
iff there is a path whose edge times never go backwards (Kempe,
Kleinberg & Kumar 2000).  Static reachability over-counts badly on
crawl/interaction graphs — an edge observed *before* the walker
arrives is not usable; this operator computes exact earliest-arrival
times, the temporal analog of BFS distance.

Fixpoint: arr(seed) = start; each superstep relaxes
``arr'(v) = min(arr(v), min{t : (u,v,t), t ≥ arr(u)})``.
Arrival times are integers, so the whole trajectory is engine-exact;
with ``converged=None`` the superstep count is fixed and the DuckDB
oracle replays it round-for-round.

Scale shape: one equi-join of the static contact table against the
settled frontier + one min-agg per superstep — identical profile to
the BFS/SSSP supersteps (algorithms/paths.py); no windows, no
collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.iterate import run_fixpoint


def temporal_earliest_arrival(
    edges: DataFrame,
    seed: int,
    *,
    start: int = 0,
    iterations: int = 10,
    t_col: str = "t",
) -> DataFrame:
    """Earliest-arrival table ``[node_id, arrival]`` (reached nodes
    only) after exactly ``iterations`` relaxation rounds over the
    directed contact list ``[src, dst, t]``."""
    spark = edges.sparkSession
    e = edges.select("src", "dst", F.col(t_col).cast("long").alias("t"))
    state0 = spark.createDataFrame(
        [(int(seed), int(start))], "node_id long, arr long"
    )

    def step(state: DataFrame, superstep: int) -> DataFrame:
        cand = (
            e.join(state.withColumnRenamed("node_id", "src"), on="src")
            .where(F.col("t") >= F.col("arr"))
            .select(F.col("dst").alias("node_id"), F.col("t").alias("arr"))
        )
        return (
            state.unionByName(cand)
            .groupBy("node_id")
            .agg(F.min("arr").alias("arr"))
        )

    final, _ = run_fixpoint(state0, step, max_iterations=int(iterations))
    return final.withColumnRenamed("arr", "arrival")
