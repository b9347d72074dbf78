import numpy as np
import pytest

from dachshund_spark import LinkGraph
from dachshund_spark.algorithms import connected_components
from dachshund_spark.local.kernels import (
    adjacency_matrix_kernel,
    approx_avg_clustering_kernel,
    approx_transitivity_kernel,
    degree_matrix_kernel,
    laplacian_kernel,
)
from tests.fixtures import ALMOST_K4_EDGES, KARATE_EDGES, SIMPLE_GRAPHS


def test_karate_matrices():
    # /root/reference/tests/karate_club.rs:373-391
    a, ids = adjacency_matrix_kernel(KARATE_EDGES)
    d, _ = degree_matrix_kernel(KARATE_EDGES)
    lap, _ = laplacian_kernel(KARATE_EDGES)
    assert a.shape == (34, 34)
    assert a.sum() == 156.0 and d.sum() == 156.0
    assert d[0, 0] == 16.0 and d[33, 33] == 17.0 and d[2, 2] == 10.0
    assert a[0].sum() == 16.0
    # node 7 (index 6) adjacent to 17 (index 16), not to 18 (index 17)
    assert a[6, 16] == 1.0 and a[6, 17] == 0.0
    assert lap.sum() == 0.0
    assert np.allclose(lap + a, d)


def test_approx_transitivity():
    # /root/reference/tests/triangles.rs:87-97: K4 exact 1.0; almost-K4
    # within 0.01 of 0.75 at 100k samples
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert approx_transitivity_kernel(k4, 10) == 1.0
    est = approx_transitivity_kernel(ALMOST_K4_EDGES, 100_000, seed=1)
    assert abs(est - 0.75) <= 0.01
    # karate within the reference's 0.05 band of 0.2556818
    est_k = approx_transitivity_kernel(KARATE_EDGES, 5000, seed=2)
    assert abs(est_k - 0.2556818181818182) <= 0.05


def test_approx_avg_clustering():
    # /root/reference/tests/triangles.rs:77-85
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert approx_avg_clustering_kernel(k4, 10) == 1.0
    est = approx_avg_clustering_kernel(ALMOST_K4_EDGES, 100_000, seed=3)
    assert abs(est - 5.0 / 6.0) <= 0.01


def test_excluding_nodes(spark):
    g = LinkGraph.from_edgelist(spark, SIMPLE_GRAPHS[5])  # triangle + tendril
    bad = spark.createDataFrame([(3,)], "node_id long")
    sub = g.excluding_nodes(bad)
    assert sub.num_edges() == 3
    assert sub.num_nodes() == 3


def test_excluding_edges_splits_component(spark):
    # reference: removing edge (2,3) from graph 5 yields 2 components
    # (/root/reference/tests/simple_graph.rs:211-222)
    g = LinkGraph.from_edgelist(spark, SIMPLE_GRAPHS[5])
    cut = spark.createDataFrame([(2, 3)], "src long, dst long")
    sub = g.excluding_edges(cut)
    # node 3 becomes isolated; pass the original node set so it keeps a
    # component slot (the reference's degree-0 quirk)
    cc = connected_components(sub, nodes=g.nodes())
    assert cc.select("component").distinct().count() == 2
    labels = {r.node_id: r.component_id for r in cc.collect()}
    assert labels[3] == 1 and labels[0] == labels[2] == 0
