"""OPIC — Online Page Importance Computation (crawl-frontier ranking).

Abiteboul, Preda & Cobena, "Adaptive On-Line Page Importance
Computation" (WWW 2003): every page holds *cash*; each round a page
records its cash into *history* and distributes it equally to its
out-neighbors.  A page's importance estimate is (history + cash) —
proportional, in the limit, to its stationary importance — and unlike
PageRank the estimate is usable while the crawl is still running,
which is why crawlers use it to prioritize the frontier.

Integer-exact determinization (the repo's oracle discipline): cash is
a BIGINT in 1e-8 units.  A node with out-degree ``od > 0`` sends
``cash DIV od`` to each out-neighbor and keeps the division remainder
for its next round (cash is conserved exactly); a dangling node keeps
all its cash.  Both Spark's ``DIV`` and DuckDB's ``//`` truncate, and
every value is non-negative, so the unrolled SQL replay is bit-exact.

Overflow bound: total cash = n·1e8 and history ≤ rounds·total, so
rounds·n < 9.2·10^10 fits BIGINT — 92 rounds at a billion nodes.

Superstep shape = PageRank's (one edges-side equi-join with the
sender's out-degree folded into the static edge table + one grouped
sum + one state join), so bucketed adjacency, hub salting and the
checkpoint machinery apply unchanged.

Reference parity note: the reference repo has no crawl tier (TSV
graphs only); this is engine-addition surface for the web-crawl
pipeline, next to trust.py / crawl budgeting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.util import gcols, hinted


def opic(
    graph: LinkGraph,
    *,
    rounds: int,
    initial_cash_e8: int = 100_000_000,
    join_hint: str | None = None,
) -> DataFrame:
    """``[graph_id?, node_id, cash_e8, history_e8, importance_e8]``
    after ``rounds`` synchronized OPIC rounds over the DISTINCT
    directed edge set; ``importance_e8 = history_e8 + cash_e8`` (the
    paper's estimator, exact integer)."""
    from dachshund_spark.iterate import run_fixpoint

    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    edges = graph.edges.select(*gcols(graph.edges), "src", "dst").distinct()
    g = gcols(edges)
    od = edges.groupBy(*g, F.col("src").alias("node_id")).agg(
        F.count(F.lit(1)).alias("od")
    )
    # fold the sender's out-degree into the static edge table once
    sedges = edges.join(
        od.select(*g, F.col("node_id").alias("src"), "od"), on=g + ["src"]
    ).persist()
    nodes = graph.nodes()
    state0 = nodes.join(od, on=g + ["node_id"], how="left").select(
        *g,
        "node_id",
        F.coalesce("od", F.lit(0)).alias("od"),
        F.lit(int(initial_cash_e8)).cast("long").alias("cash"),
        F.lit(0).cast("long").alias("hist"),
    )

    def step(state: DataFrame, superstep: int) -> DataFrame:
        inflow = (
            sedges.join(
                hinted(
                    state.select(*g, F.col("node_id").alias("src"), "cash"),
                    join_hint,
                ),
                on=g + ["src"],
            )
            .groupBy(*g, F.col("dst").alias("node_id"))
            .agg(F.sum(F.expr("cash DIV od")).alias("infl"))
        )
        kept = F.when(
            F.col("od") > 0,
            F.col("cash") - F.col("od") * F.expr("cash DIV od"),
        ).otherwise(F.col("cash"))
        return (
            state.select(
                *g,
                "node_id",
                "od",
                (F.col("hist") + F.col("cash")).alias("hist"),
                kept.alias("_keep"),
            )
            .join(hinted(inflow, join_hint), on=g + ["node_id"], how="left")
            .select(
                *g,
                "node_id",
                "od",
                (F.col("_keep") + F.coalesce("infl", F.lit(0))).alias("cash"),
                "hist",
            )
        )

    final, _ = run_fixpoint(state0, step, max_iterations=rounds)
    sedges.unpersist()
    return final.select(
        *g,
        "node_id",
        F.col("cash").alias("cash_e8"),
        F.col("hist").alias("history_e8"),
        (F.col("cash") + F.col("hist")).alias("importance_e8"),
    )
