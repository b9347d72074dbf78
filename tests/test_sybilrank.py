"""SybilRank: numpy replay, mass conservation, cut containment."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dachshund_spark.algorithms.trust import sybilrank
from dachshund_spark.graph import LinkGraph


def _k4(offset):
    nodes = list(range(offset, offset + 4))
    return [(u, v) for i, u in enumerate(nodes) for v in nodes[i + 1 :]]


# two K4s joined by a single attack edge (4, 5): the classic sparse cut
BARBELL = _k4(1) + _k4(5) + [(4, 5)]


def _numpy_sybilrank(edges, seeds, rounds):
    nodes = sorted({u for e in edges for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    a = np.zeros((len(nodes), len(nodes)))
    for u, v in edges:
        a[idx[u], idx[v]] = 1.0
        a[idx[v], idx[u]] = 1.0
    deg = a.sum(axis=1)
    t = np.zeros(len(nodes))
    for s in seeds:
        t[idx[s]] = 1.0 / len(seeds)
    for _ in range(rounds):
        t = a.T @ (t / deg)
    return {v: (t[idx[v]], t[idx[v]] / deg[idx[v]]) for v in nodes}


def _run(spark, edges, seeds, rounds):
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    out = sybilrank(g, seeds, rounds=rounds)
    return {r["node_id"]: (r["trust"], r["sybil_score"]) for r in out.collect()}


def test_matches_numpy_replay(spark):
    got = _run(spark, BARBELL, [1, 2], rounds=3)
    exp = _numpy_sybilrank(BARBELL, [1, 2], 3)
    for v, (t, s) in exp.items():
        assert got[v] == (round(t, 8), round(s, 8))


def test_mass_conserved(spark):
    got = _run(spark, BARBELL, [1, 2], rounds=4)
    assert abs(sum(t for t, _ in got.values()) - 1.0) < 1e-6


def test_sybil_cut_containment(spark):
    # early termination keeps trust on the honest side of the cut:
    # every honest node outranks every sybil on degree-normalized trust
    got = _run(spark, BARBELL, [1, 2], rounds=3)
    honest = [got[v][1] for v in (1, 2, 3, 4)]
    sybils = [got[v][1] for v in (5, 6, 7, 8)]
    assert min(honest) > max(sybils)


def test_missing_seed_raises(spark):
    g = LinkGraph(spark.createDataFrame(BARBELL, "src long, dst long"))
    with pytest.raises(ValueError, match="absent"):
        sybilrank(g, [1, 99], rounds=2).collect()


def test_multi_graph_isolation(spark):
    rows = [(0, u, v) for u, v in BARBELL] + [(1, 1, 2), (1, 2, 3)]
    g = LinkGraph(
        spark.createDataFrame(rows, "graph_id long, src long, dst long")
    )
    out = sybilrank(g, [1], rounds=2).collect()
    got = {(r["graph_id"], r["node_id"]): r["trust"] for r in out}
    exp0 = _numpy_sybilrank(BARBELL, [1], 2)
    exp1 = _numpy_sybilrank([(1, 2), (2, 3)], [1], 2)
    for v, (t, _) in exp0.items():
        assert got[(0, v)] == round(t, 8)
    for v, (t, _) in exp1.items():
        assert got[(1, v)] == round(t, 8)
