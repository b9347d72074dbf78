"""Greedy maximal matching: replay, matching property, maximality."""

import hashlib
from collections import defaultdict

from dachshund_spark.algorithms.matching import maximal_matching
from dachshund_spark.graph import LinkGraph


def _prio(seed, u, v):
    return int(hashlib.md5(f"{seed}#m#{u}#{v}".encode()).hexdigest()[:15], 16)


def _replay(edges, seed=0):
    es = {
        (min(u, v), max(u, v)) for u, v in edges if u != v
    }
    pe = {e: _prio(seed, *e) for e in es}
    matched = []
    while pe:
        mn = defaultdict(lambda: 1 << 62)
        for (u, v), p in pe.items():
            mn[u] = min(mn[u], p)
            mn[v] = min(mn[v], p)
        sel = [e for e, p in pe.items() if p == mn[e[0]] and p == mn[e[1]]]
        matched += sel
        gone = {x for e in sel for x in e}
        pe = {e: p for e, p in pe.items() if e[0] not in gone and e[1] not in gone}
    return set(matched)


def _run(spark, edges, **kw):
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    return {(r["u"], r["v"]) for r in maximal_matching(g, **kw).collect()}


def test_matches_python_replay(spark):
    edges = [((i * 3) % 23, (i * 7 + 2) % 23) for i in range(100)]
    assert _run(spark, edges) == _replay(edges)


def test_is_a_matching_and_maximal(spark):
    edges = [((i * 5) % 31, (i * i + 1) % 31) for i in range(140)]
    got = _run(spark, edges)
    nodes = [x for e in got for x in e]
    assert len(nodes) == len(set(nodes)), "a node appears in two matched edges"
    # maximality: every original edge touches a matched node
    matched = set(nodes)
    for u, v in edges:
        if u != v:
            assert u in matched or v in matched


def test_path_matches_alternate(spark):
    got = _run(spark, [(0, 1), (1, 2), (2, 3)])
    assert got in ({(0, 1), (2, 3)}, {(1, 2)})
    assert got == _replay([(0, 1), (1, 2), (2, 3)])


def test_seed_changes_matching(spark):
    edges = [((i * 3) % 23, (i * 7 + 2) % 23) for i in range(100)]
    assert _run(spark, edges, seed=1) == _replay(edges, seed=1)


def test_multi_graph_isolation(spark):
    rows = [(0, 0, 1), (0, 1, 2), (1, 0, 1)]
    g = LinkGraph(
        spark.createDataFrame(rows, "graph_id long, src long, dst long")
    )
    got = {
        (r["graph_id"], r["u"], r["v"]) for r in maximal_matching(g).collect()
    }
    exp0 = _replay([(0, 1), (1, 2)])
    assert {(u, v) for (gid, u, v) in got if gid == 0} == exp0
    assert {(u, v) for (gid, u, v) in got if gid == 1} == {(0, 1)}
