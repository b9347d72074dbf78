"""ReFeX-style recursive structural features (Henderson et al., KDD
2011 — the feature layer under RolX role discovery).

Per node: local base features (degree, triangle count) plus ``rounds``
of neighbor aggregation — each round appends, for every feature of the
previous round, the sum of that feature over the node's neighbors.
Two rounds of sums over (degree, triangles) already separate hubs,
hub-satellites, bridges, and leaves on web graphs; downstream role
models (RolX NMF, clustering) consume the table.

Only *sums* (no means): every value stays an exact integer, so the
whole table is engine-reproducible — an oracle-able stand-in for the
usual float feature pipelines.  Under ANSI mode the sums are computed
as decimal(38,0): a 2-round sum over a 10^7-degree hub's neighborhood
multiplies magnitudes ~d² and a 64-bit long would overflow exactly on
the graphs this is built for; the driver-facing query casts back to
long at fixture scale.

Scale shape: one triangle enumeration for the base features, then one
edges join + groupBy per round (map-side partial aggregation applies).
No windows, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.algorithms.triangles import triangle_counts
from dachshund_spark.graph import LinkGraph
from dachshund_spark.util import gcols


def refex_features(graph: LinkGraph, *, rounds: int = 2) -> DataFrame:
    """``[graph_id?, node_id, degree, triangles, s{r}_degree,
    s{r}_triangles, ...]`` for r = 1..rounds (decimal(38,0) sums)."""
    g = gcols(graph.edges)
    und = graph.undirected_edges()
    base = (
        graph.degrees()
        .join(triangle_counts(graph), on=g + ["node_id"])
        .select(
            *g,
            "node_id",
            F.col("degree").cast("decimal(38,0)").alias("degree"),
            F.col("triangles").cast("decimal(38,0)").alias("triangles"),
        )
    )
    feats = base
    prev_cols = ["degree", "triangles"]
    for r in range(1, int(rounds) + 1):
        new_cols = [f"s{r}_{c.split('_', 1)[-1] if '_' in c else c}" for c in prev_cols]
        nbr = und.join(
            feats.select(
                *g,
                F.col("node_id").alias("dst"),
                *[F.col(c).alias(n) for c, n in zip(prev_cols, new_cols)],
            ),
            on=g + ["dst"],
        )
        sums = nbr.groupBy(*g, F.col("src").alias("node_id")).agg(
            *[F.sum(n).cast("decimal(38,0)").alias(n) for n in new_cols]
        )
        feats = feats.join(sums, on=g + ["node_id"], how="left").select(
            *g,
            "node_id",
            *[F.col(c) for c in feats.columns if c not in g + ["node_id"]],
            *[
                F.coalesce(F.col(n), F.lit(0).cast("decimal(38,0)")).alias(n)
                for n in new_cols
            ],
        )
        prev_cols = new_cols
    return feats
