"""Matching-based coarsening: cut preservation, halving, replay."""

import hashlib
from collections import defaultdict

from pyspark.sql import functions as F

from dachshund_spark.algorithms.matching import coarsen_by_matching
from dachshund_spark.graph import LinkGraph


def _prio(seed, u, v):
    return int(hashlib.md5(f"{seed}#m#{u}#{v}".encode()).hexdigest()[:15], 16)


def _replay(edges, seed=0):
    es = {(min(u, v), max(u, v)) for u, v in edges if u != v}
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
    sup = {}
    for u, v in matched:
        sup[u] = u
        sup[v] = u
    # LinkGraph.nodes() keeps raw endpoints (incl. self-loop-only
    # nodes); they coarsen to themselves
    nodes = {x for e in edges for x in e}
    for x in nodes:
        sup.setdefault(x, x)
    coarse = defaultdict(int)
    for u, v in es:
        a, b = sup[u], sup[v]
        if a != b:
            coarse[(min(a, b), max(a, b))] += 1
    return sup, dict(coarse)


def test_matches_python_replay(spark):
    edges = [((i * 3) % 23, (i * 7 + 2) % 23) for i in range(100)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    mapping, coarse = coarsen_by_matching(g)
    exp_map, exp_coarse = _replay(edges)
    got_map = {r["node_id"]: r["super"] for r in mapping.collect()}
    assert got_map == exp_map
    got_coarse = {
        (r["u"], r["v"]): r["weight"] for r in coarse.collect()
    }
    assert got_coarse == exp_coarse


def test_cut_weight_preserved_and_graph_shrinks(spark):
    edges = [((i * 5) % 31, (i * i + 1) % 31) for i in range(140)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    mapping, coarse = coarsen_by_matching(g)
    n_fine = g.nodes().count()
    n_coarse = mapping.select("super").distinct().count()
    assert n_coarse < n_fine
    fine_edges = g.canonical_edges().count()
    intra = fine_edges - coarse.agg(F.sum("weight")).first()[0]
    # intra-pair (contracted) edges = number of matched pairs
    assert intra == n_fine - n_coarse
