"""Balanced label-propagation partitioning semantics."""

import hashlib
from itertools import combinations

import pytest

from dachshund_spark.graph import LinkGraph
from dachshund_spark.algorithms.partition import balanced_partition


pytestmark = pytest.mark.quick


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _graph(spark, edges):
    return LinkGraph(spark.createDataFrame(edges, "src long, dst long"))


def test_total_assignment_and_range(spark):
    edges = [(i, (i * 3 + 1) % 50) for i in range(50)]
    got = {r.node_id: r.part for r in
           balanced_partition(_graph(spark, edges), k=4, rounds=4).collect()}
    nodes = {s for e in edges for s in e}
    assert set(got) == nodes
    assert all(0 <= p < 4 for p in got.values())


def test_deterministic(spark):
    edges = [(i, (i * 7 + 3) % 30) for i in range(30)]
    g = _graph(spark, edges)
    a = sorted(map(tuple, balanced_partition(g, k=4, rounds=4).collect()))
    b = sorted(map(tuple, balanced_partition(g, k=4, rounds=4).collect()))
    assert a == b


def test_edge_cut_not_worse_than_init(spark):
    # two 8-cliques plus one bridge: locality should pull each clique
    # toward a single part, cutting fewer edges than the random init
    edges = (
        list(combinations(range(8), 2))
        + list(combinations(range(100, 108), 2))
        + [(0, 100)]
    )
    g = _graph(spark, edges)
    final = {r.node_id: r.part for r in
             balanced_partition(g, k=2, rounds=8, seed=0).collect()}
    init = {n: _md5_long(f"sp0#{n}") % 2 for n in final}

    def cut(assign):
        return sum(1 for a, b in edges if assign[a] != assign[b])

    assert cut(final) <= cut(init)
    # each clique ends monochromatic
    assert len({final[n] for n in range(8)}) == 1
    assert len({final[n] for n in range(100, 108)}) == 1


def test_partition_quality_census(spark):
    from dachshund_spark.algorithms.partition import partition_quality

    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5)]
    g = _graph(spark, edges)
    assign = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 1), (4, 1), (5, 1)],
        "node_id long, part long",
    )
    got = {r.part: (r.n_nodes, r.intra_edges, r.cut_edges)
           for r in partition_quality(g, assign).collect()}
    # triangle {0,1,2} in part 0, triangle {3,4,5} in part 1, edge 2-3 cut
    assert got == {0: (3, 3, 1), 1: (3, 3, 1)}
