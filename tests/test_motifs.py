"""Motif API: chained-join semantics checked against known counts."""

import pytest
from pyspark.sql import functions as F

from dachshund_spark import LinkGraph
from dachshund_spark.motifs import find
from tests.fixtures import KARATE_EDGES


@pytest.fixture(scope="module")
def karate(spark):
    return LinkGraph.from_edgelist(spark, KARATE_EDGES)


def test_triangle_motif_count(spark, karate):
    # karate has 45 triangles; on the symmetrized edge set the directed
    # 3-cycle motif matches each one 6 times (3 rotations x 2 directions)
    sym = LinkGraph(karate.undirected_edges())
    tri = find(sym, "(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)")
    assert tri.count() == 45 * 6
    assert set(tri.columns) == {"a", "b", "c"}


def test_edge_binding_struct(spark):
    g = LinkGraph.from_edgelist(spark, [(0, 1, 2), (0, 2, 3)])
    out = find(g, "(x)-[e]->(y)").orderBy("x").collect()
    assert [r.x for r in out] == [1, 2]
    assert out[0].e.src == 1 and out[0].e.dst == 2


def test_two_hop_with_negation(spark):
    # 1->2->3, 1->3 exists; 1->2->4 open (no 1->4)
    g = LinkGraph.from_edgelist(spark, [(0, 1, 2), (0, 2, 3), (0, 1, 3), (0, 2, 4)])
    closed = find(g, "(a)-[]->(b); (b)-[]->(c)")
    assert closed.count() == 2  # 1-2-3 and 1-2-4
    open_only = find(g, "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)")
    rows = {(r.a, r.b, r.c) for r in open_only.collect()}
    assert rows == {(1, 2, 4)}


def test_anonymous_vertices_not_exposed(spark, karate):
    out = find(karate, "(a)-[]->(); ()-[]->(a)")
    assert out.columns == ["a"]


def test_negated_unbound_raises(spark, karate):
    with pytest.raises(ValueError, match="unbound"):
        find(karate, "(a)-[]->(b); !(a)-[]->(z)")


def test_multi_graph_motifs(spark):
    g = LinkGraph.from_edgelist(spark, [(0, 1, 2), (0, 2, 3), (7, 1, 2)])
    out = find(g, "(a)-[]->(b); (b)-[]->(c)")
    rows = {(r.graph_id, r.a, r.b, r.c) for r in out.collect()}
    assert rows == {(0, 1, 2, 3)}


def test_self_loop_term(spark):
    g = LinkGraph.from_edgelist(spark, [(0, 1, 1), (0, 1, 2), (0, 2, 3)])
    out = find(g, "(a)-[]->(a)")
    assert [r.a for r in out.collect()] == [1]
    chained = find(g, "(a)-[]->(a); (a)-[]->(b)")
    rows = {(r.a, r.b) for r in chained.collect()}
    assert rows == {(1, 1), (1, 2)}
