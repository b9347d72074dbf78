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


def temporal_cycle_count(
    edges: DataFrame, *, delta: int, t_col: str = "t"
) -> DataFrame:
    """Count directed temporal 3-cycles u→v→w→u with strictly
    increasing edge times spanning ≤ ``delta`` (the M5,6-style cyclic
    motif of Paranjape, Benson & Leskovec 2017, "Motifs in Temporal
    Networks", with first-contact timestamps).

    Each directed pair contributes its earliest observation time (so a
    multigraph contact list collapses to one timestamp per edge and the
    count is replay-order independent).  A cycle is counted when
    t1 < t2 < t3 and t3 − t1 ≤ delta.  Times are integers end-to-end —
    the whole computation is engine-exact.

    Output: one row ``[n_edges, n_cycles]``.

    Scale shape: two equi-joins over the first-contact edge table; the
    wedge stage pre-filters on ``t2 − t1 < delta`` so only temporally
    feasible wedges reach the closing join.  At crawl scale the contact
    table should additionally be time-bucketed (join within ±delta
    buckets) so wedges never pair observations that can't close.
    """
    e = (
        edges.select("src", "dst", F.col(t_col).cast("long").alias("t"))
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("t").alias("t"))
    )
    e1 = e.select(F.col("src").alias("u"), F.col("dst").alias("v"), F.col("t").alias("t1"))
    e2 = e.select(F.col("src").alias("v"), F.col("dst").alias("w"), F.col("t").alias("t2"))
    wedges = (
        e1.join(e2, on="v")
        .where(
            (F.col("w") != F.col("u"))
            & (F.col("t2") > F.col("t1"))
            & (F.col("t2") - F.col("t1") < F.lit(int(delta)))
        )
    )
    e3 = e.select(F.col("src").alias("w"), F.col("dst").alias("u"), F.col("t").alias("t3"))
    cycles = wedges.join(e3, on=["w", "u"]).where(
        (F.col("t3") > F.col("t2"))
        & (F.col("t3") - F.col("t1") <= F.lit(int(delta)))
    )
    n_edges = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    n_cycles = cycles.agg(F.count(F.lit(1)).cast("long").alias("n_cycles"))
    return n_edges.crossJoin(n_cycles)
