"""Spark wrappers for the per-graph sequential kernels.

Each wrapper is ``groupBy(graph_id).applyInPandas`` over the edge
table: one group = one graph = one Arrow batch = one kernel call on an
executor (matching the reference's batch-per-graph TransformerBase
model, /root/reference/src/dachshund/transformer_base.rs:58-91 — rayon
pool parallelism becomes Spark task parallelism).  Frames without a
graph_id get a constant one added (single-graph mode).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.util import GRAPH_ID


def _edges_with_gid(graph: LinkGraph) -> tuple[DataFrame, bool]:
    e = graph.edges
    if GRAPH_ID in e.columns:
        return e, True
    return e.withColumn(GRAPH_ID, F.lit(0).cast("long")), False


def _strip(df: DataFrame, had_gid: bool) -> DataFrame:
    return df if had_gid else df.drop(GRAPH_ID)


def _apply_kernel(graph: LinkGraph, schema: str, fn) -> DataFrame:
    e, had = _edges_with_gid(graph)
    out = e.groupBy(GRAPH_ID).applyInPandas(fn, schema=schema)
    return _strip(out, had)


def _pairs(pdf: pd.DataFrame) -> list[tuple[int, int]]:
    return list(zip(pdf["src"].astype("int64"), pdf["dst"].astype("int64")))


def eigenvector_centrality(
    graph: LinkGraph, eps: float = 0.001, max_iter: int = 1000
) -> DataFrame:
    from dachshund_spark.local.kernels import evcent_kernel

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = int(pdf[GRAPH_ID].iloc[0])
        ev = evcent_kernel(_pairs(pdf), eps, max_iter)
        return pd.DataFrame(
            {
                GRAPH_ID: gid,
                "node_id": list(ev),
                "evcent": [ev[k] for k in ev],
            }
        )

    return _apply_kernel(
        graph, f"{GRAPH_ID} long, node_id long, evcent double", fn
    )


def fiedler_value(graph: LinkGraph) -> DataFrame:
    from dachshund_spark.local.kernels import fiedler_kernel

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = int(pdf[GRAPH_ID].iloc[0])
        return pd.DataFrame({GRAPH_ID: [gid], "fiedler": [fiedler_kernel(_pairs(pdf))]})

    return _apply_kernel(graph, f"{GRAPH_ID} long, fiedler double", fn)


def betweenness(graph: LinkGraph, brandes: bool = True) -> DataFrame:
    from dachshund_spark.local.kernels import (
        betweenness_brandes_kernel,
        betweenness_naive_kernel,
    )

    kern = betweenness_brandes_kernel if brandes else betweenness_naive_kernel

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = int(pdf[GRAPH_ID].iloc[0])
        bet = kern(_pairs(pdf))
        return pd.DataFrame(
            {
                GRAPH_ID: gid,
                "node_id": list(bet),
                "betweenness": [bet[k] for k in bet],
            }
        )

    return _apply_kernel(
        graph, f"{GRAPH_ID} long, node_id long, betweenness double", fn
    )


def cnm_communities(graph: LinkGraph) -> DataFrame:
    """[g?, node_id, community] — community = smallest member node id."""
    from dachshund_spark.local.kernels import cnm_kernel

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = int(pdf[GRAPH_ID].iloc[0])
        comms, _ = cnm_kernel(_pairs(pdf))
        rows = []
        for members in comms.values():
            label = min(members)
            rows.extend((gid, node, label) for node in sorted(members))
        return pd.DataFrame(rows, columns=[GRAPH_ID, "node_id", "community"])

    return _apply_kernel(
        graph, f"{GRAPH_ID} long, node_id long, community long", fn
    )


def cnm_modularity_changes(graph: LinkGraph) -> DataFrame:
    """[g?, step, modularity_change] — the greedy merge gain sequence
    (golden vectors in /root/reference/tests/karate_club.rs:460-504)."""
    from dachshund_spark.local.kernels import cnm_kernel

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = int(pdf[GRAPH_ID].iloc[0])
        _, changes = cnm_kernel(_pairs(pdf))
        return pd.DataFrame(
            {
                GRAPH_ID: gid,
                "step": range(len(changes)),
                "modularity_change": changes,
            }
        )

    return _apply_kernel(
        graph, f"{GRAPH_ID} long, step int, modularity_change double", fn
    )


def enumerate_shortest_paths(graph: LinkGraph, source: int) -> DataFrame:
    """[g?, node_id, path] — one row per shortest path (array of node
    ids, source included). Exponential in the worst case: fixture-scale
    only (reference shortest_paths.rs:138-169)."""
    from dachshund_spark.local.kernels import enumerate_paths_kernel

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = int(pdf[GRAPH_ID].iloc[0])
        paths = enumerate_paths_kernel(_pairs(pdf), source)
        rows = [
            (gid, target, list(path))
            for target, plist in paths.items()
            for path in plist
        ]
        return pd.DataFrame(rows, columns=[GRAPH_ID, "node_id", "path"])

    return _apply_kernel(
        graph, f"{GRAPH_ID} long, node_id long, path array<long>", fn
    )


def featurize(graph: LinkGraph, max_sources: int = 100) -> DataFrame:
    """One row per graph: [g?, stats_json] — the reference featurizer's
    output (simple_transformer.rs:41-83), seeded per graph_id for
    reproducible source sampling."""
    from dachshund_spark.local.kernels import featurize_kernel

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = int(pdf[GRAPH_ID].iloc[0])
        stats = featurize_kernel(_pairs(pdf), seed=gid, max_sources=max_sources)
        return pd.DataFrame({GRAPH_ID: [gid], "stats_json": [json.dumps(stats)]})

    return _apply_kernel(graph, f"{GRAPH_ID} long, stats_json string", fn)
