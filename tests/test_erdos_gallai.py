"""Erdős–Gallai boundary check goldens."""

import pytest

from dachshund_spark.graph import LinkGraph
from dachshund_spark.algorithms.stats import erdos_gallai


pytestmark = pytest.mark.quick


def test_star_graph(spark):
    # star K_{1,4}: degrees 4,1,1,1,1 -> boundaries: d=4 (k=1), d=1 (k=5, d<k dropped)
    df = spark.createDataFrame([(0, i) for i in range(1, 5)], "src long, dst long")
    rows = erdos_gallai(LinkGraph(df)).collect()
    assert len(rows) == 1
    r = rows[0]
    # k=1: lhs=4, rhs = 0 + sum(min(1,1)*4) = 4 -> ok (tight)
    assert (r.k, r.d, r.lhs, r.rhs, r.ok) == (1, 4, 4, 4, True)


def test_k4_boundaries(spark):
    from itertools import combinations

    df = spark.createDataFrame(
        list(combinations(range(4), 2)), "src long, dst long"
    )
    rows = erdos_gallai(LinkGraph(df)).collect()
    # all degrees 3: one boundary d=3, k=4... d<k -> dropped? d=3 >= k=4 is false
    # K4 emits nothing (trivially graphical at every strong index)
    assert rows == [] or all(r.ok for r in rows)


def test_real_graph_always_ok(spark):
    edges = [(0, i) for i in range(1, 31)] + [(i, i + 1) for i in range(1, 21)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = erdos_gallai(LinkGraph(df)).collect()
    assert rows and all(r.ok for r in rows)
    # boundaries are strictly decreasing in d, increasing in k
    srt = sorted(rows, key=lambda r: -r.d)
    assert all(a.k < b.k for a, b in zip(srt, srt[1:]))
