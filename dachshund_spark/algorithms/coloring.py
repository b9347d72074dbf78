"""Distributed greedy graph coloring (speculative / Gebremedhin-Manne).

Per round every uncolored node *tentatively* takes the mex (minimum
excluded value) of its committed neighbors' colors; a node commits
unless an uncolored neighbor picked the same tentative color with a
higher priority (md5-derived, deterministic).  Losers retry next round
against the freshly committed colors.  This converges in far fewer
rounds than classic Jones-Plassmann on dense graphs (JP's round count
is the longest priority-decreasing path; speculation commits entire
independent color classes per round).

Scale shape: each round is two equi-joins on the symmetrized edge
table (colored-neighbor colors; tentative-color conflicts) plus a
bounded ``sequence(0, k)`` explode where ``k`` = number of *distinct
committed neighbor colors* — the mex candidate range never exceeds
k+1, so a 10^6-degree hub explodes at most (χ+1) rows, not degree
rows.  Every superstep is materialized (CLAUDE.md: fixpoint plans
reference the state twice).

Determinism: priorities are the full 32-hex md5 of ``{seed}#color#id``
compared as strings with node-id tie-break, so the exact round-by-round
trace is replayable in ANSI SQL (the DuckDB oracle unrolls it).

The reference engine has no coloring; engine addition for scheduling /
conflict-free batching of graph updates (SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.util import gcols
from dachshund_spark.iterate import _stats_barrier

__all__ = ["speculative_coloring"]


def _priority(node_col, seed: int):
    return F.md5(F.concat(F.lit(f"{seed}#color#"), node_col.cast("string")))


def speculative_coloring(
    graph: LinkGraph,
    *,
    rounds: int | None = None,
    max_rounds: int = 64,
    seed: int = 0,
) -> DataFrame:
    """``[graph_id?, node_id, color]`` — a valid greedy coloring.

    ``rounds=None`` iterates until every node is colored (or
    ``max_rounds``); a fixed ``rounds`` runs exactly that many rounds
    and leaves any still-unresolved nodes with ``color = NULL`` —
    bit-for-bit replayable by a fixed SQL unroll regardless of whether
    the fixpoint was reached.
    """
    und = graph.undirected_edges()
    g = gcols(graph.edges)
    state = _stats_barrier(
        graph.nodes()
        .select(
            *g,
            "node_id",
            _priority(F.col("node_id"), seed).alias("h"),
            F.lit(None).cast("int").alias("color"),
        )
        .localCheckpoint(eager=True)
    )
    und = und.localCheckpoint(eager=True)

    n_rounds = rounds if rounds is not None else max_rounds
    for _ in range(n_rounds):
        unc = state.where(F.col("color").isNull())
        if rounds is None and unc.isEmpty():
            break
        colored = state.where(F.col("color").isNotNull())

        # distinct committed colors seen by each uncolored node
        used = (
            und.join(
                colored.select(
                    *g,
                    F.col("node_id").alias("src"),
                    F.col("color").cast("long").alias("c"),
                ),
                on=g + ["src"],
            )
            .select(*g, F.col("dst").alias("node_id"), "c")
            .join(unc.select(*g, "node_id"), on=g + ["node_id"], how="left_semi")
            .distinct()
        )
        ncol = used.groupBy(*g, "node_id").agg(F.count(F.lit(1)).alias("n"))

        # mex over 0..n (n distinct used colors leave a hole in [0, n])
        tent = (
            unc.select(*g, "node_id", "h")
            .join(ncol, on=g + ["node_id"], how="left")
            .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
            .withColumn("c", F.explode(F.sequence(F.lit(0).cast("long"), "n")))
            .join(used, on=g + ["node_id", "c"], how="left_anti")
            .groupBy(*g, "node_id", "h")
            .agg(F.min("c").cast("int").alias("tc"))
        )

        # conflict: an uncolored neighbor picked the same tentative
        # color with a strictly higher (h, node_id)
        other = tent.select(
            *g,
            F.col("node_id").alias("src"),
            F.col("tc").alias("o_tc"),
            F.col("h").alias("o_h"),
        )
        dominated = (
            und.join(other, on=g + ["src"])
            .select(*g, F.col("dst").alias("node_id"), "o_tc", "o_h", "src")
            .join(tent, on=g + ["node_id"])
            .where(
                (F.col("o_tc") == F.col("tc"))
                & (
                    (F.col("o_h") > F.col("h"))
                    | ((F.col("o_h") == F.col("h")) & (F.col("src") > F.col("node_id")))
                )
            )
            .select(*g, "node_id")
            .distinct()
        )
        win = tent.join(dominated, on=g + ["node_id"], how="left_anti")

        state = _stats_barrier(
            state.join(
                win.select(*g, "node_id", "tc"), on=g + ["node_id"], how="left"
            )
            .withColumn("color", F.coalesce(F.col("color"), F.col("tc")))
            .drop("tc")
            .localCheckpoint(eager=True)
        )

    return state.select(*g, "node_id", "color")
