"""Feature propagation over the link graph (Rossi et al. 2021,
"On the Unreasonable Effectiveness of Feature Propagation in Learning
on Graphs with Missing Node Features" — the standard cheap imputation
for GNN pipelines): known nodes pin their original value, unknown
nodes take the truncating-integer mean of their neighbors' current
values each synchronous round.

Fixed-point e8 BIGINT state end-to-end so every round is exactly
replayable in the DuckDB oracle (float neighbor means would be
aggregation-order dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph

__all__ = ["feature_propagation"]


def feature_propagation(
    graph: LinkGraph,
    features: DataFrame,
    *,
    rounds: int = 3,
) -> DataFrame:
    """Impute missing node features by iterated neighbor averaging:
    ``[node_id, known, feat_e8, filled]``.

    ``features`` is ``[node_id, feat_e8 (nullable BIGINT)]``; non-null
    rows are "known" and keep their value forever.  Each round an
    unknown node becomes ``Σ neighbor feat_e8 DIV #valued-neighbors``
    (truncating division — identical in Spark ``DIV`` and DuckDB
    ``//`` for non-negative state) over neighbors that currently HAVE
    a value, carrying its previous value when none do.  ``filled``
    marks unknown nodes that acquired a value within ``rounds``.

    Plan shape: one equi-join of the undirected edges against the
    state + one groupBy(dst) per round; state is localCheckpointed per
    superstep (the iterate rule — the step plan references it twice).
    """
    und = graph.undirected_edges().select("src", "dst").distinct()
    state = (
        graph.nodes()
        .join(features, on="node_id", how="left")
        .select(
            "node_id",
            F.col("feat_e8").isNotNull().alias("known"),
            F.col("feat_e8").cast("long").alias("feat_e8"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(int(rounds)):
        valued = state.where(F.col("feat_e8").isNotNull()).select(
            F.col("node_id").alias("src"), F.col("feat_e8").alias("_f")
        )
        imp = (
            und.join(valued, on="src")
            .groupBy(F.col("dst").alias("node_id"))
            .agg(F.expr("sum(_f) DIV count(_f)").cast("long").alias("_avg"))
        )
        state = (
            state.join(imp, on="node_id", how="left")
            .select(
                "node_id",
                "known",
                F.when(F.col("known"), F.col("feat_e8"))
                .otherwise(F.coalesce("_avg", "feat_e8"))
                .alias("feat_e8"),
            )
            .localCheckpoint(eager=True)
        )
    return state.select(
        "node_id",
        "known",
        "feat_e8",
        (~F.col("known") & F.col("feat_e8").isNotNull()).alias("filled"),
    )
