import math

import pytest

from dachshund_spark import LinkGraph
from dachshund_spark.algorithms import (
    avg_clustering,
    clustering_coefficients,
    transitivity,
    triangle_counts,
)
from tests.fixtures import (
    ALMOST_K4_AVG_CLUSTERING,
    ALMOST_K4_EDGES,
    ALMOST_K4_TRANSITIVITY,
    ALMOST_K4_TRIANGLES,
    KARATE_CLUSTERING,
    KARATE_EDGES,
    KARATE_TRANSITIVITY,
)


def test_k4_triangles(spark):
    # /root/reference/tests/triangles.rs:31-36
    k4 = LinkGraph.complete_graph(spark, 4)
    tri = {r.node_id: r.triangles for r in triangle_counts(k4).collect()}
    assert tri == {0: 3, 1: 3, 2: 3, 3: 3}


def test_almost_k4(spark):
    # /root/reference/tests/triangles.rs:37-42, :55-75
    g = LinkGraph.from_edgelist(spark, ALMOST_K4_EDGES)
    tri = {r.node_id: r.triangles for r in triangle_counts(g).collect()}
    assert tri == ALMOST_K4_TRIANGLES
    t = transitivity(g).first()["transitivity"]
    assert math.isclose(t, ALMOST_K4_TRANSITIVITY)
    c = avg_clustering(g).first()["avg_clustering"]
    assert abs(c - ALMOST_K4_AVG_CLUSTERING) <= 1e-5


def test_karate_clustering(spark):
    # /root/reference/tests/karate_club.rs:216-245
    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    cc = {r.node_id: r.clustering for r in clustering_coefficients(g).collect()}
    for node, expected in KARATE_CLUSTERING.items():
        if expected is None:
            assert cc[node] is None
        else:
            assert abs(cc[node] - expected) <= 1e-5


def test_karate_transitivity(spark):
    # /root/reference/tests/karate_club.rs:448-452
    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    t = transitivity(g).first()["transitivity"]
    assert abs(t - KARATE_TRANSITIVITY) <= 1e-12


def test_triangle_free(spark):
    g = LinkGraph.cycle_graph(spark, 5)
    tri = triangle_counts(g)
    assert tri.count() == 5
    assert tri.agg({"triangles": "sum"}).first()[0] == 0


def test_multi_graph_triangles(spark):
    edges = [(0, a, b) for a, b in ALMOST_K4_EDGES] + [(7, 0, 1), (7, 1, 2), (7, 2, 0)]
    tri = triangle_counts(LinkGraph.from_edgelist(spark, edges))
    out = {(r.graph_id, r.node_id): r.triangles for r in tri.collect()}
    assert out[(0, 0)] == 2 and out[(7, 0)] == 1


def test_weighted_clustering_barrat(spark):
    """Hand-computed Barrat coefficients: triangle 1-2-3 (w=1,2,3) +
    pendant 1-4 (w=10)."""
    from dachshund_spark.algorithms.triangles import weighted_clustering

    we = spark.createDataFrame(
        [(1, 2, 1.0), (1, 3, 2.0), (2, 3, 3.0), (1, 4, 10.0)],
        "src long, dst long, wt double",
    )
    g = LinkGraph(we, extra_cols=["wt"])
    out = {
        r.node_id: (r.strength, r.wclustering)
        for r in weighted_clustering(g).collect()
    }
    assert out[1] == (13.0, (1.0 + 2.0) / (13.0 * 2))
    assert out[2] == (4.0, (1.0 + 3.0) / (4.0 * 1))
    assert out[3] == (5.0, (2.0 + 3.0) / (5.0 * 1))
    assert out[4] == (10.0, None)  # degree 1 -> undefined


def test_weighted_clustering_uniform_weights_match_unweighted(spark):
    """With all weights 1, Barrat C_w reduces exactly to the unweighted
    local clustering coefficient."""
    from dachshund_spark.algorithms.triangles import weighted_clustering
    from tests.fixtures import KARATE_EDGES

    we = spark.createDataFrame(
        [(a, b, 1.0) for a, b in KARATE_EDGES], "src long, dst long, wt double"
    )
    g = LinkGraph(we, extra_cols=["wt"])
    cw = {r.node_id: r.wclustering for r in weighted_clustering(g).collect()}
    cu = {
        r.node_id: r.clustering
        for r in clustering_coefficients(LinkGraph.from_edgelist(spark, KARATE_EDGES)).collect()
    }
    assert set(cw) == set(cu)
    for n in cw:
        if cu[n] is None:
            assert cw[n] is None
        else:
            assert abs(cw[n] - cu[n]) <= 1e-12
