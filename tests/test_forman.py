"""Forman-Ricci edge curvature goldens."""

import pytest

from dachshund_spark.graph import LinkGraph
from dachshund_spark.algorithms.stats import forman_curvature


pytestmark = pytest.mark.quick


def test_triangle_pair_bridge(spark):
    # triangles {0,1,2} and {10,11,12} joined by the bridge 2-10
    edges = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12), (2, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r.src, r.dst): (r.tri, r.curvature)
        for r in forman_curvature(LinkGraph(df)).collect()
    }
    # triangle edges not touching the bridge node: 4-2-2+3 = 3
    assert got[(0, 1)] == (1, 3)
    assert got[(11, 12)] == (1, 3)
    # triangle edges at the degree-3 bridge endpoints: 4-3-2+3 = 2
    assert got[(0, 2)] == (1, 2)
    assert got[(1, 2)] == (1, 2)
    # the bridge itself: no support, both endpoints degree 3 -> -2
    assert got[(2, 10)] == (0, -2)


def test_complete_k4_uniform(spark):
    from itertools import combinations

    edges = list(combinations(range(4), 2))
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = forman_curvature(LinkGraph(df)).collect()
    # every K4 edge: 4-3-3+3*2 = 4
    assert len(rows) == 6
    assert all(r.tri == 2 and r.curvature == 4 for r in rows)


def test_path_negative(spark):
    # path 0-1-2: both edges tri=0, curvature 4-1-2 = 1
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {
        (r.src, r.dst): r.curvature
        for r in forman_curvature(LinkGraph(df)).collect()
    }
    assert got == {(0, 1): 1, (1, 2): 1}
