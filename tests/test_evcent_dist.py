"""Distributed power-iteration evcent vs the exact numpy recurrence."""

import numpy as np

from dachshund_spark import LinkGraph
from dachshund_spark.algorithms.evcent import eigenvector_centrality_distributed
from tests.fixtures import KARATE_EDGES


def _numpy_power(edges, iters):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    ids = sorted(adj)
    idx = {v: i for i, v in enumerate(ids)}
    a = np.zeros((len(ids), len(ids)))
    for u, nb in adj.items():
        for v in nb:
            a[idx[u], idx[v]] = 1.0
    x = np.full(len(ids), 1.0 / len(ids))
    for _ in range(iters):
        x = x @ a
        x = x / x.max()
    return {ids[i]: x[i] for i in range(len(ids))}


def test_fixed_iterations_match_numpy(spark):
    k = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    got = {
        r.node_id: r.evcent
        for r in eigenvector_centrality_distributed(k, fixed_iterations=15).collect()
    }
    ref = _numpy_power(KARATE_EDGES, 15)
    assert set(got) == set(ref)
    for n, v in ref.items():
        assert abs(got[n] - v) <= 1e-9


def test_hub_is_max_normalized(spark):
    # karate's top eigenvector node is 34; max-normalization pins it at 1.0
    k = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    got = {
        r.node_id: r.evcent
        for r in eigenvector_centrality_distributed(k, fixed_iterations=20).collect()
    }
    assert max(got, key=got.get) == 34
    assert abs(got[34] - 1.0) <= 1e-12


def test_katz_path_graph_golden(spark):
    from dachshund_spark.algorithms.evcent import katz_centrality
    from dachshund_spark.graph import LinkGraph
    from pyspark.sql import functions as F

    # 1→2→3, α=0.5, β=1: fixpoint x = (1, 1.5, 1.75)
    g = LinkGraph(spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long"))
    out = {
        r.node_id: r.katz
        for r in katz_centrality(g, alpha=0.5, beta=1.0, fixed_iterations=5).collect()
    }
    assert abs(out[1] - 1.0) < 1e-12
    assert abs(out[2] - 1.5) < 1e-12
    assert abs(out[3] - 1.75) < 1e-12


def test_katz_converges_and_orders_by_in_neighbor_mass(spark):
    from dachshund_spark.algorithms.evcent import katz_centrality
    from dachshund_spark.graph import LinkGraph

    # star into 0 plus a chain; hub 0 must rank above every leaf
    edges = [(i, 0) for i in range(1, 6)] + [(1, 2), (2, 3)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    out = {
        r.node_id: r.katz for r in katz_centrality(g, alpha=0.1).collect()
    }
    assert out[0] == max(out.values())
    assert out[3] > out[4]  # 3 has an in-link, 4 has none
