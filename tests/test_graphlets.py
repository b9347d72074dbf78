"""Graphlet census vs brute-force enumeration on small random graphs."""

import itertools
import random

import pytest

from dachshund_spark.graph import LinkGraph
from dachshund_spark.motifs import graphlet_census

pytestmark = pytest.mark.quick


def _brute(nodes, edges):
    adj = {v: set() for v in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    e = set(frozenset(x) for x in edges)

    def is_edge(a, b):
        return frozenset((a, b)) in e

    wedge = sum(
        1 for v in nodes for _ in itertools.combinations(sorted(adj[v]), 2)
    )
    tri = sum(
        1
        for a, b, c in itertools.combinations(sorted(nodes), 3)
        if is_edge(a, b) and is_edge(b, c) and is_edge(a, c)
    )
    claw = sum(
        1 for v in nodes for _ in itertools.combinations(sorted(adj[v]), 3)
    )
    # non-induced 3-edge paths: ordered (a,b,c,d) distinct, /2 for reversal
    path4 = (
        sum(
            1
            for a, b, c, d in itertools.permutations(nodes, 4)
            if is_edge(a, b) and is_edge(b, c) and is_edge(c, d)
        )
        // 2
    )
    # 4-cycles: ordered closed walks on 4 distinct vertices / 8
    cycle4 = (
        sum(
            1
            for a, b, c, d in itertools.permutations(nodes, 4)
            if is_edge(a, b) and is_edge(b, c) and is_edge(c, d) and is_edge(d, a)
        )
        // 8
    )
    # diamonds: pairs of triangles sharing an edge
    tris = [
        (a, b, c)
        for a, b, c in itertools.combinations(sorted(nodes), 3)
        if is_edge(a, b) and is_edge(b, c) and is_edge(a, c)
    ]
    diamond = 0
    for t1, t2 in itertools.combinations(tris, 2):
        if len(set(t1) & set(t2)) == 2:
            diamond += 1
    k4 = sum(
        1
        for q in itertools.combinations(sorted(nodes), 4)
        if all(is_edge(a, b) for a, b in itertools.combinations(q, 2))
    )
    return {
        "wedge": wedge,
        "triangle": tri,
        "claw": claw,
        "path4": path4,
        "cycle4": cycle4,
        "diamond": diamond,
        "clique4": k4,
    }


def test_graphlet_census_matches_brute_force(spark):
    rng = random.Random(11)
    nodes = list(range(9))
    edges = [
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if rng.random() < 0.45
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["motif"]: r["count"] for r in graphlet_census(LinkGraph(df)).collect()
    }
    assert got == _brute(nodes, edges)


def test_graphlet_census_k4(spark):
    edges = [(a, b) for a, b in itertools.combinations(range(4), 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["motif"]: r["count"] for r in graphlet_census(LinkGraph(df)).collect()
    }
    # K4: 12 wedges? C(3,2)*4 = 12; 4 triangles; 4 claws; paths: 12;
    # 3 cycles; diamonds: C(4,2) triangle pairs sharing an edge = 6? no:
    # 4 triangles, each pair shares exactly one edge -> C(4,2) = 6
    assert got == {
        "wedge": 12,
        "triangle": 4,
        "claw": 4,
        "path4": 12,
        "cycle4": 3,
        "diamond": 6,
        "clique4": 1,
    }
