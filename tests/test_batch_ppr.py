"""Batch PPR: numpy replay, mass conservation, sparse support."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dachshund_spark.algorithms.batch_ppr import batch_personalized_pagerank
from dachshund_spark.graph import LinkGraph

EDGES = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (5, 0)]  # 4 is dangling


def _numpy_ppr(edges, seed, d, iters):
    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    es = sorted(set(edges))
    od = {}
    for u, _ in es:
        od[u] = od.get(u, 0) + 1
    r = np.zeros(len(nodes))
    r[idx[seed]] = 1.0
    for _ in range(iters):
        nr = np.zeros(len(nodes))
        dm = sum(r[idx[v]] for v in nodes if v not in od)
        for u, v in es:
            nr[idx[v]] += d * r[idx[u]] / od[u]
        nr[idx[seed]] += (1 - d) + d * dm
        r = nr
    return {v: r[idx[v]] for v in nodes}


def _run(spark, edges, seeds, **kw):
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    out = batch_personalized_pagerank(g, seeds, **kw)
    res = {}
    for r in out.collect():
        res.setdefault(r["seed"], {})[r["node_id"]] = r["rank"]
    return res


def test_matches_numpy_per_seed(spark):
    got = _run(spark, EDGES, [0, 3], damping=0.85, iterations=5)
    for s in (0, 3):
        exp = _numpy_ppr(EDGES, s, 0.85, 5)
        for v, r in exp.items():
            assert got[s].get(v, 0.0) == round(r, 8) or (
                round(r, 8) == 0.0 and v not in got[s]
            )


def test_mass_conserved_per_seed(spark):
    got = _run(spark, EDGES, [0, 2, 3], iterations=6)
    for s, vec in got.items():
        assert abs(sum(vec.values()) - 1.0) < 1e-6, s


def test_state_is_sparse_initially(spark):
    # one iteration from seed 5: support is exactly {5, 0}
    got = _run(spark, EDGES, [5], iterations=1)
    assert set(got[5]) == {5, 0}


def test_missing_seed_raises(spark):
    g = LinkGraph(spark.createDataFrame(EDGES, "src long, dst long"))
    with pytest.raises(ValueError, match="absent"):
        batch_personalized_pagerank(g, [99])


def test_multi_graph_rejected(spark):
    g = LinkGraph(
        spark.createDataFrame([(0, 1, 2)], "graph_id long, src long, dst long")
    )
    with pytest.raises(ValueError, match="single-graph"):
        batch_personalized_pagerank(g, [1])
