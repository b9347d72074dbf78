"""Strongly connected components + bow-tie decomposition.

The reference has undirected CC only
(/root/reference/src/dachshund/algorithms/connected_components.rs);
SCC/bow-tie are the directed web-graph extension.  Correctness is
pinned against hand-computed fixtures and a local iterative Tarjan on
a seeded random directed graph.
"""

import random

import pytest
from pyspark.sql import functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.algorithms.scc import (
    bow_tie,
    strongly_connected_components,
)


def _sccs(spark, edges):
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    out = strongly_connected_components(g)
    return {r.node_id: r.scc_id for r in out.collect()}


def _tarjan(edges):
    """Local iterative Tarjan; returns {node: min-member-of-scc}."""
    adj = {}
    nodes = set()
    for s, d in edges:
        nodes.add(s)
        nodes.add(d)
        if s != d:
            adj.setdefault(s, []).append(d)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    comp = {}
    counter = [0]

    def strongconnect(v0):
        work = [(v0, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            succs = adj.get(v, [])
            for i in range(pi, len(succs)):
                w = succs[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                m = min(members)
                for w in members:
                    comp[w] = m
            work.pop()
            if work:
                p, _ = work[-1]
                low[p] = min(low[p], low[v])

    for v in sorted(nodes):
        if v not in index:
            strongconnect(v)
    return comp


def test_two_cycles_one_way_bridge(spark):
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    out = _sccs(spark, edges)
    assert out == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}


def test_dag_all_singletons(spark):
    edges = [(0, 1), (1, 2), (2, 3), (0, 3)]
    out = _sccs(spark, edges)
    assert out == {0: 0, 1: 1, 2: 2, 3: 3}


def test_self_loops_are_singletons(spark):
    edges = [(0, 0), (0, 1), (1, 1)]
    out = _sccs(spark, edges)
    assert out == {0: 0, 1: 1}


def test_long_directed_cycle(spark):
    n = 12
    edges = [(i, (i + 1) % n) for i in range(n)]
    out = _sccs(spark, edges)
    assert out == {i: 0 for i in range(n)}


def test_interlocking_chain_of_sccs(spark):
    # c0 -> c1 -> c2, each a 2-cycle: needs multiple outer peel rounds
    edges = []
    for c in range(3):
        a, b = 2 * c, 2 * c + 1
        edges += [(a, b), (b, a)]
        if c < 2:
            edges.append((b, 2 * c + 2))
    out = _sccs(spark, edges)
    assert out == {0: 0, 1: 0, 2: 2, 3: 2, 4: 4, 5: 4}


def test_matches_local_tarjan_random(spark):
    rng = random.Random(7)
    n = 60
    edges = sorted(
        {(rng.randrange(n), rng.randrange(n)) for _ in range(150)}
    )
    expect = _tarjan(edges)
    out = _sccs(spark, edges)
    assert out == expect


def test_scc_multigraph_grouped(spark):
    rows = [("a", 0, 1), ("a", 1, 0), ("a", 1, 2),
            ("b", 0, 1), ("b", 1, 2), ("b", 2, 0)]
    g = LinkGraph(
        spark.createDataFrame(rows, "graph_id string, src long, dst long")
    )
    out = strongly_connected_components(g)
    got = {(r.graph_id, r.node_id): r.scc_id for r in out.collect()}
    assert got == {
        ("a", 0): 0, ("a", 1): 0, ("a", 2): 2,
        ("b", 0): 0, ("b", 1): 0, ("b", 2): 0,
    }


def test_bow_tie_regions(spark):
    # in: 1 -> core {3,4} -> out: 5 -> 6; disconnected: 9 <-> 10 (a
    # smaller scc, still 'other'); tendril 7 -> 1 is 'in'-side upstream
    edges = [
        (3, 4), (4, 3),
        (1, 3), (7, 1),
        (4, 5), (5, 6),
        (9, 10), (10, 9),
    ]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    out = {r.node_id: r.region for r in bow_tie(g).collect()}
    assert out == {
        3: "core", 4: "core",
        1: "in", 7: "in",
        5: "out", 6: "out",
        9: "other", 10: "other",
    }


def test_bow_tie_largest_scc_ties_break_to_min_id(spark):
    # two 2-cycles, no connection: core must be the min-scc_id one
    edges = [(0, 1), (1, 0), (5, 6), (6, 5)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    out = {r.node_id: r.region for r in bow_tie(g).collect()}
    assert out == {0: "core", 1: "core", 5: "other", 6: "other"}


def test_condensation_levels_layering(spark):
    from dachshund_spark.algorithms.scc import condensation_levels
    from dachshund_spark.graph import LinkGraph

    # cycle {0,1} -> 2 -> cycle {3,4} -> 5 ; also 2 -> 5 (skip edge)
    e = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 3), (3, 4), (4, 3), (4, 5), (2, 5)],
        "src long, dst long",
    )
    out = {r["scc_id"]: r["level"] for r in
           condensation_levels(LinkGraph(e)).collect()}
    # scc ids are min members: {0},{2},{3},{5}
    assert out == {0: 0, 2: 1, 3: 2, 5: 3}
