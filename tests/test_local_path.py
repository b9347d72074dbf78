"""Local Path index goldens (exact A², A³ walk counts)."""

import pytest

from dachshund_spark.graph import LinkGraph
from dachshund_spark.algorithms.linkpred import local_path_scores


pytestmark = pytest.mark.quick


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        (r.u, r.v): (r.p2, r.p3, r.lp_e2)
        for r in local_path_scores(LinkGraph(df)).collect()
    }


def test_k4_minus_edge(spark):
    # edges 01,02,12,13,23 — only (0,3) is non-adjacent: A2=2, A3=2
    got = _run(spark, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)])
    assert got == {(0, 3): (2, 2, 202)}


def test_c4_bipartite_no_odd_walks(spark):
    # 4-cycle: both diagonals have 2 common neighbors and, by
    # bipartite parity, zero length-3 walks
    got = _run(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    assert got == {(0, 2): (2, 0, 200), (1, 3): (2, 0, 200)}


def test_path_graph(spark):
    got = _run(spark, [(0, 1), (1, 2), (2, 3)])
    assert got == {(0, 2): (1, 0, 100), (1, 3): (1, 0, 100)}
