"""Densest subgraph peel: clique-vs-path golden, approximation bound,
node recovery, and input validation."""

import pytest
from pyspark.sql import functions as F

from dachshund_spark.graph import LinkGraph


@pytest.fixture(scope="module")
def clique_plus_path(spark):
    # K8 on nodes 0..7 (density 3.5) with a 20-node path hanging off
    # node 0: path nodes have degree <= 2 and peel off in round one,
    # leaving the clique intact as the best round.
    rows = [(i, j) for i in range(8) for j in range(i + 1, 8)]
    rows += [(100 + i, 100 + i + 1) for i in range(19)]
    rows.append((0, 100))
    return LinkGraph(spark.createDataFrame(rows, "src long, dst long"))


def test_densest_history_isolates_clique(spark, clique_plus_path):
    from dachshund_spark.algorithms.densest import densest_subgraph_history

    hist = densest_subgraph_history(clique_plus_path, epsilon=0.5).collect()
    best = [r for r in hist if r.is_best]
    assert len(best) == 1
    b = best[0]
    assert b.n_nodes == 8 and b.n_edges == 28
    assert b.density == pytest.approx(3.5)
    # rounds are strictly shrinking and round 0 covers the whole graph
    r0 = min(hist, key=lambda r: r.round)
    assert r0.n_nodes == 28 and r0.n_edges == 28 + 20
    sizes = [r.n_nodes for r in sorted(hist, key=lambda r: r.round)]
    assert sizes == sorted(sizes, reverse=True)


def test_densest_approximation_bound(spark):
    """On any graph the best peel density is >= optimum / (2(1+eps));
    check against the known optimum of a clique+noise fixture."""
    from dachshund_spark.algorithms.densest import densest_subgraph_history

    rows = [(i, j) for i in range(6) for j in range(i + 1, 6)]  # K6: 2.5
    rows += [(200 + i, 300 + i) for i in range(30)]  # matching: 0.5
    g = LinkGraph(spark.createDataFrame(rows, "src long, dst long"))
    hist = densest_subgraph_history(g, epsilon=0.5).collect()
    best = max(r.density for r in hist)
    assert best >= 2.5 / 3.0
    assert best <= 2.5 + 1e-9  # cannot exceed the true optimum here


def test_densest_nodes_recover_clique(spark, clique_plus_path):
    from dachshund_spark.algorithms.densest import densest_subgraph_nodes

    nodes = sorted(
        r.node_id for r in densest_subgraph_nodes(clique_plus_path).collect()
    )
    assert nodes == list(range(8))


def test_densest_validation(spark):
    from dachshund_spark.algorithms.densest import densest_subgraph_history

    g = LinkGraph(spark.createDataFrame([(1, 2)], "src long, dst long"))
    with pytest.raises(ValueError):
        densest_subgraph_history(g, epsilon=0.0)
    gg = LinkGraph(
        spark.createDataFrame(
            [(0, 1, 2)], "graph_id long, src long, dst long"
        )
    )
    with pytest.raises(ValueError):
        densest_subgraph_history(gg)


def test_densest_empty_graph(spark):
    from dachshund_spark.algorithms.densest import densest_subgraph_history

    g = LinkGraph(
        spark.createDataFrame([], "src long, dst long")
    )
    assert densest_subgraph_history(g).count() == 0
