"""FastRP node embeddings (Chen et al. 2019, "Fast and Accurate
Network Embeddings via Very Sparse Random Projection").

Dachshund has no embedding generator — its node features stop at
centralities (/root/reference/src/dachshund/algorithms/). For a
web-scale link graph, per-node embeddings are the input to the ANN /
near-dup stack (pipeline/similarity.py), and FastRP is the
embarrassingly-Spark-friendly way to get them: embedding =
Σ_k w_k · A^k · R where R is a very sparse random projection matrix.
Each power is ONE edges-side equi-join + ONE grouped sum — exactly the
PageRank superstep shape, so bucketed adjacency / salting / AQE all
apply unchanged, and no Python ever touches a row.

Determinism + oracle exactness: R's entries are md5-derived in
{-1, 0, +1} (density 1/2: P(+1)=P(-1)=1/4) and the iterated states stay
BIGINT, so every value is engine-exact in DuckDB replay — no float
aggregation order anywhere. The classical sqrt(s) scaling and any
normalization are per-node scalar transforms of the integer state, left
to ``normalize="l2"`` (float, applied once at the end, never summed).

Magnitude bound (ANSI overflow safety): |state_k| ≤ Δ^k · k-hop count
where Δ is max degree; with default k=2 even a 10^7-degree hub stays
≤ ~10^14, far under 2^63. k ≥ 4 on hub-heavy graphs is the caller's
overflow risk — documented, not guarded (ANSI mode throws loudly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.iterate import _stats_barrier
from dachshund_spark.pipeline.text import md5_long
from dachshund_spark.util import hinted


def _projection_entry(seed: int, node, d: int):
    """md5-derived sparse projection entry in {-1, 0, +1}.

    bucket = md5long('<seed>#rp#<node>#<d>') % 4 → 0:+1, 1:-1, else 0.
    Replayed verbatim in the DuckDB oracle (_fastrp_sql).
    """
    h = md5_long(F.concat_ws("#", F.lit(seed), F.lit("rp"), node, F.lit(d)))
    return (
        F.when(h % 4 == 0, F.lit(1))
        .when(h % 4 == 1, F.lit(-1))
        .otherwise(F.lit(0))
        .cast("long")
    )


def fastrp_embeddings(
    graph: LinkGraph,
    *,
    dim: int = 8,
    weights: tuple[int, ...] = (1, 2),
    seed: int = 0,
    normalize: str | None = None,
    join_hint: str | None = None,
) -> DataFrame:
    """[g?, node_id, e0..e{dim-1}] — integer FastRP embeddings.

    ``weights[k-1]`` scales the A^k·R term (k = 1..len(weights));
    integer weights keep the output BIGINT-exact. ``normalize="l2"``
    converts to unit-length DOUBLE vectors as a final map (one sqrt per
    node, no cross-row float math).
    """
    if not weights:
        raise ValueError("weights must name at least one power of A")
    und = graph.undirected_edges().where(F.col("src") != F.col("dst")).persist()
    g = graph.grouping
    ecols = [f"e{d}" for d in range(dim)]

    nodes = und.select(*g, F.col("src").alias("node_id")).distinct()
    state = nodes.select(
        *g,
        "node_id",
        *[_projection_entry(seed, F.col("node_id"), d).alias(c) for d, c in enumerate(ecols)],
    )
    acc = None
    for w in weights:
        # state ← A · state: one equi-join on the edge table, one
        # grouped elementwise sum (dim codegen aggregates, one shuffle)
        state = _stats_barrier(
            und.join(
                hinted(
                    state.select(*g, F.col("node_id").alias("dst"), *ecols),
                    join_hint,
                ),
                on=g + ["dst"],
            )
            .groupBy(*g, F.col("src").alias("node_id"))
            .agg(*[F.sum(c).alias(c) for c in ecols])
            .localCheckpoint(eager=True)
        )
        term = state.select(
            *g, "node_id", *[(F.col(c) * F.lit(int(w))).alias(c) for c in ecols]
        )
        if acc is None:
            acc = term
        else:
            # every node appears in every power (symmetrized adjacency:
            # a node with a neighbor keeps one forever), so inner
            # union+sum is exact
            acc = (
                acc.unionByName(term)
                .groupBy(*g, "node_id")
                .agg(*[F.sum(c).alias(c) for c in ecols])
            )
    if normalize is None:
        return acc
    if normalize != "l2":
        raise ValueError(f"unknown normalize mode {normalize!r}")
    norm = F.sqrt(
        sum((F.col(c).cast("double") * F.col(c).cast("double") for c in ecols), F.lit(0.0))
    )
    return acc.select(
        *g,
        "node_id",
        *[
            F.when(norm > 0, F.col(c).cast("double") / norm)
            .otherwise(F.lit(0.0))
            .alias(c)
            for c in ecols
        ],
    )
