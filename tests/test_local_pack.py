import json

import pytest

from dachshund_spark import LinkGraph
from dachshund_spark.local import (
    betweenness,
    cnm_communities,
    cnm_modularity_changes,
    eigenvector_centrality,
    enumerate_shortest_paths,
    featurize,
    fiedler_value,
)
from tests.fixtures import (
    KARATE_BETWEENNESS,
    KARATE_CNM_MODULARITY_CHANGES,
    KARATE_EDGES,
    KARATE_EVCENT,
    KARATE_FIEDLER,
    SIMPLE_CNM_MODULARITY_CHANGES,
    SIMPLE_GRAPHS,
)


@pytest.fixture(scope="module")
def karate(spark):
    return LinkGraph.from_edgelist(spark, KARATE_EDGES)


def test_betweenness_brandes_golden(spark, karate):
    # /root/reference/tests/karate_club.rs:337-354 (tol 1e-6)
    out = {r.node_id: r.betweenness for r in betweenness(karate, brandes=True).collect()}
    for node, expected in KARATE_BETWEENNESS.items():
        assert abs(out[node] - expected) <= 1e-6, node


def test_betweenness_naive_matches(spark, karate):
    out = {r.node_id: r.betweenness for r in betweenness(karate, brandes=False).collect()}
    for node, expected in KARATE_BETWEENNESS.items():
        assert abs(out[node] - expected) <= 1e-6, node


def test_evcent_golden(spark, karate):
    # /root/reference/tests/karate_club.rs:394-404 (tol = eps 0.001)
    out = {r.node_id: r.evcent for r in eigenvector_centrality(karate).collect()}
    for node, expected in KARATE_EVCENT.items():
        assert abs(out[node] - expected) <= 0.001, node


def test_fiedler_golden(spark, karate):
    assert abs(fiedler_value(karate).first().fiedler - KARATE_FIEDLER) <= 0.001


def test_cnm_karate_golden(spark, karate):
    # /root/reference/tests/karate_club.rs:460-504 (tol 1e-3 each)
    rows = sorted(
        cnm_modularity_changes(karate).collect(), key=lambda r: r.step
    )
    got = [r.modularity_change for r in rows]
    assert len(got) >= len(KARATE_CNM_MODULARITY_CHANGES)
    for i, expected in enumerate(KARATE_CNM_MODULARITY_CHANGES):
        assert abs(got[i] - expected) <= 0.001, i


def test_cnm_simple_graphs_golden(spark):
    # /root/reference/tests/simple_graph.rs:143-205 — all 7 fixture graphs
    # in ONE multi-graph frame (exercises per-group isolation)
    edges = [
        (gid, a, b) for gid, es in SIMPLE_GRAPHS.items() for a, b in es
    ]
    g = LinkGraph.from_edgelist(spark, edges)
    rows = cnm_modularity_changes(g).collect()
    by_graph = {}
    for r in rows:
        by_graph.setdefault(r.graph_id, {})[r.step] = r.modularity_change
    for gid, expected in SIMPLE_CNM_MODULARITY_CHANGES.items():
        got = [by_graph[gid][s] for s in sorted(by_graph[gid])]
        assert len(got) >= len(expected), gid
        for i, e in enumerate(expected):
            assert abs(got[i] - e) <= 0.001, (gid, i)


def test_cnm_communities_partition(spark, karate):
    out = cnm_communities(karate)
    assert out.count() == 34
    n_comms = out.select("community").distinct().count()
    assert 2 <= n_comms <= 6  # CNM finds 3 communities on karate


def test_path_enumeration_golden(spark, karate):
    # /root/reference/tests/karate_club.rs:276-294: 89 distinct paths,
    # specific 4-hop paths to node 16
    out = enumerate_shortest_paths(karate, 1)
    paths = {tuple(r.path) for r in out.collect()}
    assert len(paths) == 89
    assert (1, 9, 34, 16) in paths
    assert (1, 3, 33, 16) in paths
    to_16 = [p for p in paths if p[-1] == 16]
    assert len(to_16) == 7
    to_30 = [p for p in paths if p[-1] == 30]
    assert all(len(p) == 4 for p in to_30)


def test_featurizer(spark, karate):
    row = featurize(karate).first()
    stats = json.loads(row.stats_json)
    # golden facts: 78 edges, 1 CC of 34, k-cores exist to k=4 only
    assert stats["num_edges"] == 78
    assert stats["num_connected_components"] == 1
    assert stats["size_of_largest_cc"] == 34
    assert stats["num_2_cores"] == 1
    assert stats["num_4_cores"] == 1
    assert stats["num_8_cores"] == 0
    assert stats["num_16_cores"] == 0
    assert stats["num_3_trusses"] >= 1
    assert stats["num_17_trusses"] == 0
    # avg clustering floored to 3 decimals, None-skipping mean over the
    # 33 nodes with degree >= 2 (clustering.rs:36-44): 0.5879… → 0.587
    assert stats["clust_coef"] == 0.587
    # all 34 sources sampled (<=100): deterministic full betweenness mean
    import statistics

    from tests.fixtures import KARATE_EDGES as KE
    from dachshund_spark.local.kernels import betweenness_brandes_kernel, floor3

    expected_bet = floor3(
        statistics.mean(betweenness_brandes_kernel(KE).values())
    )
    assert stats["bet_cent"] == expected_bet


def test_featurizer_multi_graph(spark):
    edges = [(0, a, b) for a, b in SIMPLE_GRAPHS[1]] + [
        (5, a, b) for a, b in SIMPLE_GRAPHS[5]
    ]
    g = LinkGraph.from_edgelist(spark, edges)
    rows = {r.graph_id: json.loads(r.stats_json) for r in featurize(g).collect()}
    assert rows[0]["num_edges"] == 3
    assert rows[5]["num_edges"] == 4
    assert rows[0]["num_3_trusses"] == 1
