"""Distributed eigenvector centrality (max-normalized power iteration).

The reference's loop (eigenvector_centrality.rs:16-37; pandas-island
port in local/kernels.evcent_kernel): x1 = 1/n, then per iteration
x ← x·A over the symmetric adjacency (self-loops dropped) followed by
max-normalization, stopping when the L1 change ≤ eps.  This module is
the scale path: one edges-side join + one sum aggregation + one
(tiny, broadcast) per-graph max join per superstep — the same
superstep shape as PageRank, so everything said there about bucketed
adjacency and salting applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.iterate import run_fixpoint
from dachshund_spark.util import gcols


def eigenvector_centrality_distributed(
    graph: LinkGraph,
    *,
    eps: float = 0.001,
    max_iterations: int = 1000,
    fixed_iterations: int | None = None,
) -> DataFrame:
    """[g?, node_id, evcent] — max-normalized, so the top node is 1.0.

    ``fixed_iterations`` pins the superstep count (oracle parity);
    otherwise the kernel's L1 stopping rule applies.
    """
    und = graph.undirected_edges().where(F.col("src") != F.col("dst")).persist()
    g = gcols(und)
    nodes = und.select(*g, F.col("src").alias("node_id")).distinct()
    if g:
        n_df = nodes.groupBy(*g).agg(F.count("*").alias("n"))
        x0 = nodes.join(F.broadcast(n_df), on=g).select(
            *g, "node_id", (1.0 / F.col("n")).alias("x")
        )
    else:
        n = nodes.count()
        if n == 0:
            raise ValueError(
                "graph has no non-self-loop edges — eigenvector "
                "centrality is undefined"
            )
        x0 = nodes.withColumn("x", F.lit(1.0 / n))

    def step(state: DataFrame, superstep: int) -> DataFrame:
        summed = (
            und.join(
                state.select(*g, F.col("node_id").alias("src"), "x"), on=g + ["src"]
            )
            .groupBy(*g, F.col("dst").alias("node_id"))
            .agg(F.sum("x").alias("x"))
        )
        mx = summed.groupBy(*g).agg(F.max("x").alias("mx"))
        if g:
            summed = summed.join(F.broadcast(mx), on=g)
        else:
            summed = summed.crossJoin(F.broadcast(mx))
        # nodes with no surviving neighbors keep value 0 (kernel: row of
        # zeros in A) — left join back onto the node set
        normalized = summed.select(
            *g, "node_id", (F.col("x") / F.col("mx")).alias("x")
        )
        return (
            state.select(*g, "node_id")
            .join(normalized, on=g + ["node_id"], how="left")
            .select(*g, "node_id", F.coalesce("x", F.lit(0.0)).alias("x"))
        )

    if fixed_iterations is not None:
        converged = None
        budget = fixed_iterations
    else:
        budget = max_iterations

        def converged(prev: DataFrame, new: DataFrame) -> tuple[bool, dict]:
            diff = (
                new.join(
                    prev.select(*g, "node_id", F.col("x").alias("px")),
                    on=g + ["node_id"],
                )
                .agg(F.sum(F.abs(F.col("x") - F.col("px"))))
                .first()[0]
            )
            return diff is not None and diff <= eps, {"l1_diff": float(diff or 0.0)}

    final, _ = run_fixpoint(
        x0, step, converged=converged, max_iterations=budget
    )
    und.unpersist()
    return final.withColumnRenamed("x", "evcent")


def katz_centrality(
    graph: LinkGraph,
    *,
    alpha: float = 0.1,
    beta: float = 1.0,
    fixed_iterations: int | None = None,
    max_iterations: int = 100,
    tol: float = 1e-9,
) -> DataFrame:
    """Katz centrality over the DIRECTED graph (Katz 1953):
    ``[graph_id?, node_id, katz]`` from the fixpoint
    x(v) = β + α · Σ_{u→v} x(u), x₀ = β.

    Unlike eigenvector centrality, Katz gives mass to nodes with zero
    in-degree (the β floor) and converges for α below 1/λ_max — on a
    web graph pick α ≤ 1/(max in-degree), the standard safe bound.
    Superstep shape is PageRank's minus the degree normalization and
    dangling handling: one edges-side join + one sum + no per-graph
    scalar joins, so bucketed adjacency and salting apply unchanged.
    """
    e = graph.edges.select(*gcols(graph.edges), "src", "dst").distinct().persist()
    g = gcols(e)
    nodes = (
        e.select(*g, F.col("src").alias("node_id"))
        .union(e.select(*g, F.col("dst").alias("node_id")))
        .distinct()
    )
    x0 = nodes.withColumn("x", F.lit(float(beta)))

    def step(state: DataFrame, superstep: int) -> DataFrame:
        contrib = (
            e.join(
                state.select(*g, F.col("node_id").alias("src"), "x"),
                on=g + ["src"],
            )
            .groupBy(*g, F.col("dst").alias("node_id"))
            .agg(F.sum("x").alias("contrib"))
        )
        return state.select(*g, "node_id").join(
            contrib, on=g + ["node_id"], how="left"
        ).select(
            *g,
            "node_id",
            (
                F.lit(float(beta))
                + F.lit(float(alpha)) * F.coalesce("contrib", F.lit(0.0))
            ).alias("x"),
        )

    if fixed_iterations is not None:
        converged = None
        budget = fixed_iterations
    else:
        budget = max_iterations

        def converged(prev: DataFrame, new: DataFrame) -> tuple[bool, dict]:
            diff = (
                new.join(
                    prev.select(*g, "node_id", F.col("x").alias("px")),
                    on=g + ["node_id"],
                )
                .agg(F.max(F.abs(F.col("x") - F.col("px"))))
                .first()[0]
            )
            return diff is not None and diff <= tol, {"linf_diff": float(diff or 0.0)}

    final, _ = run_fixpoint(x0, step, converged=converged, max_iterations=budget)
    e.unpersist()
    return final.withColumnRenamed("x", "katz")
