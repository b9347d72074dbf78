"""Local community detection via PPR sweep cut (Andersen, Chung &
Lang, FOCS 2006).

Rank nodes by degree-normalized seed-PPR, sweep prefixes of the
ranking, and return the prefix with minimum conductance — the
standard local-clustering primitive (seed-expansion community
detection, link-farm neighborhood carving).

Everything is integer-exact so the whole pipeline oracles:

* the PPR vector comes from a fixed-point push — state is a BIGINT
  1e12-scaled mass, each superstep moves ``(17·r) div (20·od)`` along
  every out-edge (damping 17/20 = 0.85) and restores the 0.15·scale
  teleport at the seed.  Truncating division loses sub-ulp mass
  deterministically — identical in any engine, unlike float sums
  whose aggregation order differs.
* the sweep ordering key is ``(r·10^6) div degree`` (ties → node id),
  the conductance argmin key is ``(cut·10^9) div min(vol, 2m−vol)``
  (ties → smaller prefix).

Scale shape: the push is sparse frontier state against a shared,
out-degree-weighted edge table (one equi-join + grouped sum per
superstep).  The sweep itself runs on the top-``top`` ranked nodes
only (a distributed TakeOrderedAndProject, not a global sort); all
windows afterwards are over ≤``top`` rows by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.iterate import run_fixpoint
from dachshund_spark.util import gcols


def ppr_push_integer(
    graph: LinkGraph,
    seed: int,
    *,
    iterations: int = 6,
    scale: int = 10**12,
    d_num: int = 17,
    d_den: int = 20,
) -> DataFrame:
    """Sparse integer PPR mass ``[node_id, r]`` (rows only where mass
    arrived; single-graph frames only)."""
    if gcols(graph.edges):
        raise ValueError("ppr_push_integer is single-graph only")
    spark = graph.edges.sparkSession
    edges = graph.edges.select("src", "dst").distinct()
    od = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    wedges = edges.join(od, on="src").persist()
    teleport = int(scale * (d_den - d_num)) // d_den
    state0 = spark.createDataFrame([(int(seed), int(scale))], "node_id long, r long")
    tele_df = spark.createDataFrame(
        [(int(seed), teleport)], "node_id long, r long"
    )

    def step(state: DataFrame, superstep: int) -> DataFrame:
        contrib = (
            wedges.join(
                state.withColumnRenamed("node_id", "src"), on="src"
            )
            .select(
                F.col("dst").alias("node_id"),
                F.expr(f"({d_num} * r) DIV ({d_den} * od)").alias("r"),
            )
            .groupBy("node_id")
            .agg(F.sum("r").alias("r"))
        )
        return (
            contrib.unionByName(tele_df)
            .groupBy("node_id")
            .agg(F.sum("r").alias("r"))
        )

    final, _ = run_fixpoint(state0, step, max_iterations=int(iterations))
    return final.where(F.col("r") > 0)


def sweep_cut(
    graph: LinkGraph,
    seed: int,
    *,
    iterations: int = 6,
    top: int = 64,
) -> DataFrame:
    """Best-conductance sweep community around ``seed``:
    ``[node_id, rnk, sweep_size, cut, vol]`` — one row per member,
    ranked by the sweep order; cut/vol are the winning prefix's."""
    r = ppr_push_integer(graph, seed, iterations=iterations)
    deg = graph.degrees()
    keyed = r.join(deg, on="node_id").withColumn(
        "_key", F.expr("(r * 1000000) DIV degree")
    )
    # distributed top-k; the 64-row result makes every window below O(1)
    ranked = (
        keyed.orderBy(F.desc("_key"), F.asc("node_id"))
        .limit(int(top))
        .withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.desc("_key"), F.asc("node_id"))),
        )
        .select("node_id", "rnk", "degree")
        .persist()
    )
    und = graph.undirected_edges()
    two_m = deg.agg(F.sum("degree").alias("two_m"))
    internal = (
        und.where(F.col("src") < F.col("dst"))
        .join(ranked.select(F.col("node_id").alias("src"), F.col("rnk").alias("_ru")), on="src")
        .join(ranked.select(F.col("node_id").alias("dst"), F.col("rnk").alias("_rv")), on="dst")
        .groupBy(F.greatest("_ru", "_rv").alias("rnk"))
        .agg(F.count(F.lit(1)).alias("_ni"))
    )
    w = Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, 0)
    sweep = (
        ranked.join(internal, on="rnk", how="left")
        .withColumn("_vol", F.sum("degree").over(w))
        .withColumn("_int", F.sum(F.coalesce("_ni", F.lit(0))).over(w))
        .crossJoin(two_m)
        .select(
            "rnk",
            (F.col("_vol") - 2 * F.col("_int")).alias("cut"),
            F.col("_vol").alias("vol"),
            F.least(F.col("_vol"), F.col("two_m") - F.col("_vol")).alias("_mv"),
        )
        .where(F.col("_mv") > 0)
        .withColumn("_phi", F.expr("(cut * 1000000000) DIV _mv"))
    )
    best = (
        sweep.orderBy(F.asc("_phi"), F.asc("rnk"))
        .limit(1)
        .select(F.col("rnk").alias("sweep_size"), "cut", "vol")
    )
    return ranked.crossJoin(best).where(F.col("rnk") <= F.col("sweep_size")).select(
        "node_id", "rnk", "sweep_size", "cut", "vol"
    )
