"""FastRP embeddings: exact numpy replay, normalization, isolation."""

import hashlib

import numpy as np
from pyspark.sql import functions as F

from dachshund_spark.algorithms.fastrp import fastrp_embeddings
from dachshund_spark.graph import LinkGraph

EDGES = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (5, 1)]


def _proj(seed, node, d):
    h = int(hashlib.md5(f"{seed}#rp#{node}#{d}".encode()).hexdigest()[:15], 16)
    return {0: 1, 1: -1}.get(h % 4, 0)


def _numpy_fastrp(edges, dim, weights, seed):
    nodes = sorted({u for e in edges for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    a = np.zeros((len(nodes), len(nodes)), dtype=np.int64)
    for u, v in edges:
        a[idx[u], idx[v]] = 1
        a[idx[v], idx[u]] = 1
    r = np.array(
        [[_proj(seed, v, d) for d in range(dim)] for v in nodes], dtype=np.int64
    )
    out = np.zeros_like(r)
    state = r
    for w in weights:
        state = a @ state
        out = out + w * state
    return {v: out[idx[v]].tolist() for v in nodes}


def _collect(df, dim):
    return {
        r["node_id"]: [r[f"e{d}"] for d in range(dim)] for r in df.collect()
    }


def test_matches_numpy_replay(spark):
    g = LinkGraph(spark.createDataFrame(EDGES, "src long, dst long"))
    got = _collect(fastrp_embeddings(g, dim=4, weights=(1, 2), seed=0), 4)
    assert got == _numpy_fastrp(EDGES, 4, (1, 2), 0)


def test_three_powers_and_seed_sensitivity(spark):
    g = LinkGraph(spark.createDataFrame(EDGES, "src long, dst long"))
    got = _collect(fastrp_embeddings(g, dim=3, weights=(2, 1, 3), seed=7), 3)
    assert got == _numpy_fastrp(EDGES, 3, (2, 1, 3), 7)
    other = _collect(fastrp_embeddings(g, dim=3, weights=(2, 1, 3), seed=8), 3)
    assert got != other


def test_l2_normalize(spark):
    g = LinkGraph(spark.createDataFrame(EDGES, "src long, dst long"))
    raw = _collect(fastrp_embeddings(g, dim=4, weights=(1, 2), seed=0), 4)
    unit = _collect(
        fastrp_embeddings(g, dim=4, weights=(1, 2), seed=0, normalize="l2"), 4
    )
    for v, vec in unit.items():
        n = float(np.linalg.norm(raw[v]))
        if n == 0:
            assert vec == [0.0] * 4
        else:
            assert np.allclose(vec, np.array(raw[v], dtype=float) / n)


def test_multi_graph_isolation(spark):
    rows = [(0, u, v) for u, v in EDGES] + [(1, 1, 2)]
    g = LinkGraph(
        spark.createDataFrame(rows, "graph_id long, src long, dst long")
    )
    out = fastrp_embeddings(g, dim=2, weights=(1,), seed=0).collect()
    got = {
        (r["graph_id"], r["node_id"]): [r["e0"], r["e1"]] for r in out
    }
    exp0 = _numpy_fastrp(EDGES, 2, (1,), 0)
    exp1 = _numpy_fastrp([(1, 2)], 2, (1,), 0)
    for v, vec in exp0.items():
        assert got[(0, v)] == vec
    for v, vec in exp1.items():
        assert got[(1, v)] == vec
