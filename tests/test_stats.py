"""Whole-graph structural statistics (assortativity, reciprocity,
log-binned degree distribution)."""

import numpy as np
from pyspark.sql import functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.algorithms.stats import (
    degree_assortativity,
    degree_distribution,
    reciprocity,
)


def _local_assortativity(edges):
    """Newman r on the undirected double cover, via numpy."""
    und = set()
    for s, d in edges:
        if s != d:
            und.add((min(s, d), max(s, d)))
    deg = {}
    for s, d in und:
        deg[s] = deg.get(s, 0) + 1
        deg[d] = deg.get(d, 0) + 1
    xs, ys = [], []
    for s, d in und:
        xs += [deg[s], deg[d]]
        ys += [deg[d], deg[s]]
    return float(np.corrcoef(xs, ys)[0, 1])


def test_star_graph_is_maximally_disassortative(spark):
    edges = [(0, i) for i in range(1, 8)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    (r,) = degree_assortativity(g).collect()
    assert abs(r.assortativity - (-1.0)) < 1e-12


def test_assortativity_matches_numpy(spark):
    rng = np.random.default_rng(11)
    edges = sorted(
        {(int(a), int(b)) for a, b in rng.integers(0, 40, size=(120, 2)) if a != b}
    )
    expect = _local_assortativity(edges)
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    (r,) = degree_assortativity(g).collect()
    assert abs(r.assortativity - expect) < 1e-9


def test_assortativity_regular_graph_null(spark):
    # cycle: every degree equal -> zero variance -> undefined (null)
    n = 6
    edges = [(i, (i + 1) % n) for i in range(n)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    (r,) = degree_assortativity(g).collect()
    assert r.assortativity is None


def test_reciprocity_counts(spark):
    # 1<->2 reciprocal; 3->4, 5->6 one-way; dup + self-loop ignored
    edges = [(1, 2), (2, 1), (3, 4), (5, 6), (3, 4), (7, 7)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    (r,) = reciprocity(g).collect()
    assert (r.n_edges, r.n_reciprocal) == (4, 2)
    assert abs(r.reciprocity - 0.5) < 1e-12


def test_reciprocity_dag_zero_cycle_one(spark):
    dag = LinkGraph(
        spark.createDataFrame([(0, 1), (1, 2), (0, 2)], "src long, dst long")
    )
    (r,) = reciprocity(dag).collect()
    assert r.n_reciprocal == 0 and r.reciprocity == 0.0
    both = LinkGraph(
        spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    )
    (r2,) = reciprocity(both).collect()
    assert r2.reciprocity == 1.0


def test_degree_distribution_log_bins(spark):
    # hub 0 with 8 leaves (deg 8 -> bin 3); leaves deg 1 -> bin 0
    edges = [(0, i) for i in range(1, 9)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    out = {r.bin: r.n_nodes for r in degree_distribution(g).collect()}
    assert out == {3: 1, 0: 8}
    raw = {
        r.bin: r.n_nodes
        for r in degree_distribution(g, log_binned=False).collect()
    }
    assert raw == {8: 1, 1: 8}


def test_stats_multigraph_grouped(spark):
    rows = [("a", 0, 1), ("a", 1, 0), ("b", 0, 1), ("b", 1, 2)]
    g = LinkGraph(
        spark.createDataFrame(rows, "graph_id string, src long, dst long")
    )
    rec = {r.graph_id: r.reciprocity for r in reciprocity(g).collect()}
    assert rec == {"a": 1.0, "b": 0.0}
    dd = degree_distribution(g)
    got = {(r.graph_id, r.bin): r.n_nodes for r in dd.collect()}
    assert got == {("a", 0): 2, ("b", 0): 2, ("b", 1): 1}
