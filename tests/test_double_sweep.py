"""Double-sweep diameter lower bound."""

import pytest

from dachshund_spark.algorithms.paths import double_sweep_diameter
from dachshund_spark.graph import LinkGraph


def _run(spark, edges, **kw):
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    return double_sweep_diameter(g, **kw).collect()[0]


def test_path_graph_exact(spark):
    # 0-1-2-3-4: from source 2 the far node is 0 (tie 0 vs 4 -> min id),
    # and the second sweep finds the true diameter 4 at witness 4
    r = _run(spark, [(i, i + 1) for i in range(4)], source=2)
    assert (r["source"], r["ecc_source"], r["far_node"]) == (2, 2, 0)
    assert (r["diameter_lb"], r["witness"]) == (4, 4)


def test_star_graph(spark):
    r = _run(spark, [(0, i) for i in range(1, 6)], source=0)
    assert r["ecc_source"] == 1 and r["far_node"] == 1
    # leaf-to-leaf diameter 2, witness = smallest other leaf
    assert r["diameter_lb"] == 2 and r["witness"] == 2


def test_lower_bound_on_cycle(spark):
    # C6: true diameter 3; double sweep from any node attains it
    r = _run(spark, [(i, (i + 1) % 6) for i in range(6)], source=0)
    assert r["diameter_lb"] == 3


def test_missing_source_raises(spark):
    with pytest.raises(ValueError, match="not in graph"):
        _run(spark, [(1, 2)], source=99)


def test_multi_graph_rejected(spark):
    g = LinkGraph(
        spark.createDataFrame(
            [(0, 1, 2)], "graph_id long, src long, dst long"
        )
    )
    with pytest.raises(ValueError, match="single-graph"):
        double_sweep_diameter(g)
