"""Luby MIS property and determinism tests."""

from pyspark.sql import functions as F

from dachshund_spark import LinkGraph
from dachshund_spark.algorithms.mis import maximal_independent_set
from tests.fixtures import KARATE_EDGES


def _check_mis(edges, rows):
    und = {(a, b) for a, b in edges} | {(b, a) for a, b in edges}
    mis = {n for n, v in rows.items() if v}
    for a in mis:
        for b in mis:
            assert (a, b) not in und, f"MIS nodes {a},{b} are adjacent"
    for n, v in rows.items():
        if not v:
            assert any((n, m) in und for m in mis), f"{n} has no MIS neighbor"
    return mis


def test_mis_karate_valid_and_deterministic(spark):
    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    out1 = {r.node_id: r.in_mis for r in maximal_independent_set(g).collect()}
    mis = _check_mis(KARATE_EDGES, out1)
    assert len(mis) > 0
    # same seed -> identical set, independent of partitioning
    g2 = LinkGraph(g.edges.repartition(7))
    out2 = {r.node_id: r.in_mis for r in maximal_independent_set(g2).collect()}
    assert out1 == out2


def test_mis_different_seed_changes_set(spark):
    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    a = {r.node_id for r in maximal_independent_set(g, seed=0).collect() if r.in_mis}
    b = {r.node_id for r in maximal_independent_set(g, seed=1).collect() if r.in_mis}
    _check_mis(KARATE_EDGES, {n: n in b for n in {x for e in KARATE_EDGES for x in e}})
    assert a != b  # md5 priorities differ; overwhelmingly a different set


def test_mis_path_graph(spark):
    # deep path: MIS must be a maximal subset with no two adjacent
    edges = [(i, i + 1) for i in range(40)]
    g = LinkGraph.from_edgelist(spark, edges)
    rows = {r.node_id: r.in_mis for r in maximal_independent_set(g).collect()}
    mis = _check_mis(edges, rows)
    # on a 41-node path any maximal independent set has >= ceil(41/3) nodes
    assert len(mis) >= 14


def test_mis_multi_graph(spark):
    edges = [(0, 1, 2), (0, 2, 3), (1, 1, 2), (1, 2, 3), (1, 3, 1)]
    g = LinkGraph.from_edgelist(spark, edges)
    out = {
        (r.graph_id, r.node_id): r.in_mis
        for r in maximal_independent_set(g).collect()
    }
    for gid in (0, 1):
        per = {n: v for (gg, n), v in out.items() if gg == gid}
        e = [(a, b) for (gg, a, b) in edges if gg == gid]
        _check_mis(e, per)


def test_mis_triangle_picks_exactly_one(spark):
    g = LinkGraph.from_edgelist(spark, [(1, 2), (2, 3), (1, 3)])
    rows = maximal_independent_set(g).collect()
    assert sum(r.in_mis for r in rows) == 1
