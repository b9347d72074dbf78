"""Neighborhood function (HyperBall + exact twin) and distance summary."""

import pytest

from dachshund_spark.graph import LinkGraph
from dachshund_spark.algorithms.neighborhood import (
    distance_summary,
    neighborhood_function,
    neighborhood_function_exact,
)
from tests.fixtures import KARATE_EDGES


def _nf_dict(df, grouped=False):
    if grouped:
        return {(r.graph_id, r.distance): r.n_pairs for r in df.collect()}
    return {r.distance: r.n_pairs for r in df.collect()}


def test_exact_path_graph_closed_form(spark):
    # P5: N(t) = 5 + 2*sum_{i=1..t}(5-i)
    g = LinkGraph.path_graph(spark, 5)
    nf = _nf_dict(neighborhood_function_exact(g))
    assert nf == {0: 5, 1: 13, 2: 19, 3: 23, 4: 25}


def test_hyperball_exact_at_fixture_scale(spark):
    # DataSketches HLL is exact in sparse mode at n=34, so the sketch
    # curve must equal the exact curve bit-for-bit on karate
    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    exact = _nf_dict(neighborhood_function_exact(g))
    hyper = _nf_dict(neighborhood_function(g, lg_k=12))
    assert hyper == exact
    assert max(exact) == 5  # karate diameter


def test_multi_graph_per_graph_curves(spark):
    edges = [(1, s, d) for (s, d) in [(0, 1), (1, 2), (2, 3), (3, 4)]] + [
        (2, s, d) for (s, d) in [(0, 1), (1, 2), (2, 0)]
    ]
    g = LinkGraph.from_edgelist(spark, edges)
    exact = _nf_dict(neighborhood_function_exact(g), grouped=True)
    # P5 curve under graph 1, triangle (converges at t=1) under graph 2
    assert exact[(1, 0)] == 5 and exact[(1, 4)] == 25
    assert exact[(2, 0)] == 3 and exact[(2, 1)] == 9
    assert (2, 2) not in exact  # triangle ball is complete at t=1
    hyper = _nf_dict(neighborhood_function(g, lg_k=12), grouped=True)
    assert hyper == exact


def test_directed_balls(spark):
    # directed path 0→1→2: balls shrink along the walk direction
    g = LinkGraph.from_edgelist(spark, [(0, 1), (1, 2)])
    nf = _nf_dict(neighborhood_function_exact(g, directed=True))
    assert nf == {0: 3, 1: 5, 2: 6}


def test_distance_summary_path_graph(spark):
    g = LinkGraph.path_graph(spark, 5)
    row = distance_summary(neighborhood_function_exact(g)).collect()[0]
    assert row.avg_distance == pytest.approx(2.0)
    # 0.9 * 25 = 22.5 lands between N(2)=19 and N(3)=23 -> 2 + 3.5/4
    assert row.effective_diameter == pytest.approx(2.875)
    assert row.reachable_pairs == 25


def test_distance_summary_complete_graph_no_interp(spark):
    # K4: N(0)=4, N(1)=16; alpha hit at t=1 with interpolation from N(0)
    g = LinkGraph.complete_graph(spark, 4)
    row = distance_summary(neighborhood_function_exact(g)).collect()[0]
    assert row.avg_distance == pytest.approx(1.0)
    assert row.effective_diameter == pytest.approx((0.9 * 16 - 4) / 12)
    assert row.reachable_pairs == 16


def test_harmonic_exact_path_graph(spark):
    from dachshund_spark.algorithms.neighborhood import harmonic_centrality_exact

    g = LinkGraph.path_graph(spark, 5)
    rows = {r.node_id: r for r in harmonic_centrality_exact(g).collect()}
    assert rows[0].harmonic == pytest.approx(1 + 1 / 2 + 1 / 3 + 1 / 4)
    assert rows[2].harmonic == pytest.approx(3.0)
    assert rows[0].closeness == pytest.approx(4 / 10)
    assert rows[2].closeness == pytest.approx(4 / 6)
    assert all(r.reachable == 5 for r in rows.values())


def test_harmonic_hyperball_matches_exact_on_karate(spark):
    from dachshund_spark.algorithms.neighborhood import (
        harmonic_centrality,
        harmonic_centrality_exact,
    )

    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    exact = {
        r.node_id: (r.reachable, round(r.harmonic, 8))
        for r in harmonic_centrality_exact(g).collect()
    }
    hyper = {
        r.node_id: (r.ball_size, round(r.harmonic, 8))
        for r in harmonic_centrality(g, lg_k=12).collect()
    }
    assert hyper == exact


def test_harmonic_directed_sink(spark):
    from dachshund_spark.algorithms.neighborhood import harmonic_centrality_exact

    g = LinkGraph.from_edgelist(spark, [(0, 1), (1, 2)])
    rows = {
        r.node_id: r
        for r in harmonic_centrality_exact(g, directed=True).collect()
    }
    assert rows[2].reachable == 1
    assert rows[2].harmonic == 0.0 and rows[2].closeness == 0.0
    assert rows[0].harmonic == pytest.approx(1.5)
    assert rows[0].closeness == pytest.approx(2 / 3)


def test_ego_networks_path_graph(spark):
    from dachshund_spark.algorithms.neighborhood import ego_networks
    from dachshund_spark.graph import LinkGraph

    # directed chain 0→1→2→3→4; ego(0, r=2) = {0,1,2}
    g = LinkGraph(
        spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (3, 4)], "src long, dst long"
        )
    )
    members, edges = ego_networks(g, [0, 3], radius=2, directed=True)
    m = {(r.seed, r.node_id): r.dist for r in members.collect()}
    assert m == {
        (0, 0): 0, (0, 1): 1, (0, 2): 2,
        (3, 3): 0, (3, 4): 1,
    }
    e = {(r.seed, r.src, r.dst) for r in edges.collect()}
    assert e == {(0, 0, 1), (0, 1, 2), (3, 3, 4)}


def test_ego_networks_undirected_and_missing_seed(spark):
    from dachshund_spark.algorithms.neighborhood import ego_networks
    from dachshund_spark.graph import LinkGraph

    g = LinkGraph(
        spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    )
    # seed 99 is not in the graph → contributes nothing
    members, edges = ego_networks(g, [2, 99], radius=1, directed=False)
    m = {(r.seed, r.node_id): r.dist for r in members.collect()}
    assert m == {(2, 2): 0, (2, 1): 1}
    # induced UNDIRECTED edges appear in both orientations
    e = {(r.seed, r.src, r.dst) for r in edges.collect()}
    assert e == {(2, 1, 2), (2, 2, 1)}


def test_landmark_estimate_bounds_true_distance(spark):
    from dachshund_spark.algorithms.neighborhood import (
        estimate_distances,
        landmark_distances,
    )
    from dachshund_spark.graph import LinkGraph

    # cycle of 6: true d(0,3) = 3; landmark 1 gives d(0,1)+d(1,3) = 3
    # (on a shortest path → exact); landmark 4 gives 2+1=3 too
    edges = [(i, (i + 1) % 6) for i in range(6)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    dists = landmark_distances(g, [1, 4], max_distance=8)
    got = {(r.landmark, r.node_id): r.dist for r in dists.collect()}
    assert got[(1, 1)] == 0 and got[(1, 4)] == 3 and got[(4, 0)] == 2
    pairs = spark.createDataFrame([(0, 3), (2, 5)], "u long, v long")
    est = {(r.u, r.v): r.est_distance for r in
           estimate_distances(dists, pairs).collect()}
    assert est[(0, 3)] == 3  # landmark on a shortest path → exact
    assert est[(2, 5)] == 3  # d(2,1)+d(1,5)=1+2 or d(2,4)+d(4,5)=2+1


def test_landmark_estimate_is_upper_bound(spark):
    from dachshund_spark.algorithms.neighborhood import (
        estimate_distances,
        landmark_distances,
    )
    from dachshund_spark.graph import LinkGraph

    # path 0-1-2 plus landmark 9 hanging off 0: est d(1,2) via 9 is
    # d(1,9)+d(9,2) = 2+3 = 5 — a valid upper bound, not the true 1
    edges = [(0, 1), (1, 2), (0, 9)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    dists = landmark_distances(g, [9], max_distance=8)
    pairs = spark.createDataFrame([(1, 2)], "u long, v long")
    (r,) = estimate_distances(dists, pairs).collect()
    assert r.est_distance == 5


def test_estimate_distances_directed_needs_backward_table(spark):
    from dachshund_spark.algorithms.neighborhood import (
        estimate_distances,
        landmark_distances,
    )
    from dachshund_spark.graph import LinkGraph
    from pyspark.sql import functions as F

    # directed: u -> l -> v; d(u,v)=2 only via l
    g = LinkGraph(
        spark.createDataFrame([(10, 1), (1, 20)], "src long, dst long")
    )
    fwd = landmark_distances(g, [1], max_distance=4, directed=True)
    rev = LinkGraph(
        g.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    bwd = landmark_distances(rev, [1], max_distance=4, directed=True)
    pairs = spark.createDataFrame([(10, 20)], "u long, v long")
    (r,) = estimate_distances(fwd, pairs, backward_dists=bwd).collect()
    assert r.est_distance == 2  # d(10->1)+d(1->20)


def test_effective_diameter_path(spark):
    from dachshund_spark.algorithms.neighborhood import effective_diameter
    from dachshund_spark.graph import LinkGraph

    # path 0-1-2-3: N = [4, 10, 14, 16]; target 14.4 -> 2 + 0.4/2
    g = LinkGraph.from_edgelist(spark, [(0, 1), (1, 2), (2, 3)])
    got = effective_diameter(g).collect()[0].effective_diameter
    assert abs(got - 2.2) < 1e-12
    # quantile below N(0): diameter 0 by convention
    got0 = effective_diameter(g, q=0.2).collect()[0].effective_diameter
    assert got0 == 0.0


def test_effective_diameter_clique_and_multigraph(spark):
    from dachshund_spark.algorithms.neighborhood import effective_diameter
    from dachshund_spark.graph import LinkGraph

    # K4: N = [4, 16]; target 14.4 -> 0 + 10.4/12
    edges = [(0, u, v) for u in range(4) for v in range(4) if u < v]
    edges += [(1, 0, 1), (1, 1, 2), (1, 2, 3)]  # path in graph 1
    df = spark.createDataFrame(edges, "graph_id long, src long, dst long")
    out = {
        r.graph_id: r.effective_diameter
        for r in effective_diameter(LinkGraph(df)).collect()
    }
    assert abs(out[0] - (14.4 - 4) / 12) < 1e-12
    assert abs(out[1] - 2.2) < 1e-12
