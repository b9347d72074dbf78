"""Local bridges: edges in no triangle."""

from dachshund_spark.graph import LinkGraph
from dachshund_spark.algorithms.sparsify import local_bridges


def test_two_triangles_joined(spark):
    # triangles {0,1,2} and {10,11,12} joined by 2-10, plus pendant 12-20
    edges = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12),
             (2, 10), (12, 20)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.src, r.dst): (r.du, r.dv) for r in local_bridges(LinkGraph(df)).collect()}
    # only the joining edge and the pendant edge are outside triangles
    assert set(got) == {(2, 10), (12, 20)}
    assert got[(2, 10)] == (3, 3)
    assert got[(12, 20)] == (3, 1)


def test_complete_graph_has_none(spark):
    from itertools import combinations

    edges = list(combinations(range(5), 2))
    df = spark.createDataFrame(edges, "src long, dst long")
    assert local_bridges(LinkGraph(df)).count() == 0
