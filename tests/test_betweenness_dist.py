"""Distributed Brandes vs the reference-parity local kernel."""

import pytest

from dachshund_spark import LinkGraph
from dachshund_spark.algorithms.betweenness import betweenness_sampled, sample_sources
from dachshund_spark.local.kernels import betweenness_brandes_kernel
from tests.fixtures import KARATE_EDGES


@pytest.fixture(scope="module")
def karate(spark):
    return LinkGraph.from_edgelist(spark, KARATE_EDGES)


def test_exact_matches_kernel(spark, karate):
    # all sources == exact betweenness; kernel carries the reference's
    # 1e-6 goldens (karate_club.rs), so matching it transitively pins us
    dist = {r.node_id: r.betweenness for r in betweenness_sampled(karate).collect()}
    ref = betweenness_brandes_kernel(KARATE_EDGES)
    assert set(dist) == set(ref)
    for n, v in ref.items():
        assert abs(dist[n] - v) <= 1e-9


def test_sampled_matches_kernel_on_same_sources(spark, karate):
    srcs = [r.source for r in sample_sources(karate, 10, seed=4).collect()]
    assert len(srcs) == 10
    dist = {
        r.node_id: r.betweenness
        for r in betweenness_sampled(karate, sample=10, seed=4).collect()
    }
    ref = betweenness_brandes_kernel(KARATE_EDGES, sources=srcs)
    for n, v in ref.items():
        assert abs(dist[n] - v) <= 1e-9


def test_multi_graph(spark):
    edges = [(0, 1, 2), (0, 2, 3), (9, 5, 6), (9, 6, 7), (9, 7, 8)]
    g = LinkGraph.from_edgelist(spark, edges)
    out = {
        (r.graph_id, r.node_id): r.betweenness
        for r in betweenness_sampled(g).collect()
    }
    # path graph 1-2-3: node 2 interior on 1 path each direction -> 1.0
    assert out[(0, 2)] == pytest.approx(1.0)
    assert out[(0, 1)] == 0.0
    # path 5-6-7-8: ends 0; 6 and 7 symmetric
    assert out[(9, 6)] == pytest.approx(out[(9, 7)])
    assert out[(9, 6)] > 0


def test_edge_betweenness_path(spark):
    from dachshund_spark.algorithms.betweenness import edge_betweenness_sampled
    from dachshund_spark.graph import LinkGraph

    # path 1-2-3-4, all sources: pair counts through each edge
    # (1,2): pairs {1-2,1-3,1-4} -> 3; (2,3): {1-3,1-4,2-3,2-4} -> 4
    g = LinkGraph.from_edgelist(spark, [(1, 2), (2, 3), (3, 4)])
    got = {
        (r.u, r.v): r.betweenness
        for r in edge_betweenness_sampled(g).collect()
    }
    assert got == {(1, 2): 3.0, (2, 3): 4.0, (3, 4): 3.0}


def test_edge_betweenness_bridge_dominates(spark):
    from dachshund_spark.algorithms.betweenness import edge_betweenness_sampled
    from dachshund_spark.graph import LinkGraph

    # two triangles + bridge (3,4): bridge carries all 9 cross pairs
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    g = LinkGraph.from_edgelist(spark, edges)
    got = {
        (r.u, r.v): r.betweenness
        for r in edge_betweenness_sampled(g).collect()
    }
    assert got[(3, 4)] == 9.0
    assert max(got, key=got.get) == (3, 4)
    assert len(got) == 7  # every edge scored (none missing)


def test_edge_betweenness_networkx_convention(spark):
    from dachshund_spark.algorithms.betweenness import edge_betweenness_sampled
    from dachshund_spark.graph import LinkGraph

    # star K1,3 centered at 0: each edge carries its leaf's pairs to
    # the other 2 leaves (as midpoints, halved both ways) + the direct
    # pair: 1 + 2*0.5*... = unnormalized count of pairs through edge:
    # pairs through (0,i): (i,j) for j != i (2 pairs) + (0,i) itself = 3
    g = LinkGraph.from_edgelist(spark, [(0, 1), (0, 2), (0, 3)])
    got = {
        (r.u, r.v): r.betweenness
        for r in edge_betweenness_sampled(g).collect()
    }
    assert got == {(0, 1): 3.0, (0, 2): 3.0, (0, 3): 3.0}
