"""Bridge-free (2-edge-connected) components (stats.two_edge_components)."""
import pytest

from dachshund_spark.algorithms.stats import two_edge_components
from dachshund_spark.graph import LinkGraph


def test_two_edge_components_hand_graph(spark):
    # triangle 0-1-2, bridge 2-3, triangle 3-4-5, pendant 5-6
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5), (5, 6)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    out = {r.node_id: r.component for r in two_edge_components(g).collect()}
    # bridges 2-3 and 5-6 removed: {0,1,2}, {3,4,5}, {6} singleton
    assert out == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3, 6: 6}


def test_two_edge_components_cycle_is_one_component(spark):
    edges = [(i, (i + 1) % 6) for i in range(6)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    out = {r.node_id: r.component for r in two_edge_components(g).collect()}
    assert set(out.values()) == {0} and len(out) == 6
