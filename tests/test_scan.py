"""SCAN structural clustering — cross-checked against an independent
pure-Python implementation on the karate club, plus invariants."""

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from dachshund_spark.algorithms.scan import scan_clusters
from dachshund_spark.graph import LinkGraph
from tests.fixtures import KARATE_EDGES


def _scan_py(edges, mu=3):
    # eps = 1/2 hard-coded: ((t+2)*2)^2 >= (du+1)(dv+1)
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    nodes = sorted(adj)

    def ok(u, v):
        t = len(adj[u] & adj[v])
        return ((t + 2) * 2) ** 2 >= (len(adj[u]) + 1) * (len(adj[v]) + 1)

    epsn = {u: {v for v in adj[u] if ok(u, v)} for u in nodes}
    core = {u for u in nodes if 1 + len(epsn[u]) >= mu}

    parent = {u: u for u in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u in core:
        for v in epsn[u]:
            if v in core:
                a, b = find(u), find(v)
                if a != b:
                    parent[max(a, b)] = min(a, b)
    cluster = {}
    for u in core:
        root = find(u)
        cluster.setdefault(root, []).append(u)
    label = {}
    for members in cluster.values():
        m = min(members)
        for u in members:
            label[u] = m
    out = {}
    for u in core:
        out[u] = (label[u], "core")
    for u in nodes:
        if u in core:
            continue
        cands = [label[v] for v in epsn[u] if v in core]
        if cands:
            out[u] = (min(cands), "border")
    for u in nodes:
        if u in out:
            continue
        nbr = {out[v][0] for v in adj[u] if v in out}
        out[u] = (None, "hub" if len(nbr) >= 2 else "outlier")
    return out


@pytest.fixture(scope="module")
def karate(spark):
    return LinkGraph(spark.createDataFrame(KARATE_EDGES, ["src", "dst"]))


def test_scan_matches_reference_impl(spark, karate):
    got = {
        r["node_id"]: (r["cluster"], r["role"])
        for r in scan_clusters(karate, eps_num=1, eps_den=2, mu=3).collect()
    }
    assert got == _scan_py(KARATE_EDGES, mu=3)


def test_scan_mu2_roles_are_consistent(spark, karate):
    rows = scan_clusters(karate, eps_num=1, eps_den=2, mu=2).collect()
    assert len(rows) == 34
    by_role = defaultdict(list)
    for r in rows:
        by_role[r["role"]].append(r)
    # cores and borders carry a cluster label, hubs/outliers never do
    assert all(r["cluster"] is not None for r in by_role["core"] + by_role["border"])
    assert all(r["cluster"] is None for r in by_role["hub"] + by_role["outlier"])
    # each cluster label is one of its own core members
    cores = {r["node_id"] for r in by_role["core"]}
    assert {r["cluster"] for r in by_role["core"]} <= cores
    # raising mu only shrinks the core set
    cores3 = {
        r["node_id"]
        for r in scan_clusters(karate, eps_num=1, eps_den=2, mu=3).collect()
        if r["role"] == "core"
    }
    assert cores3 <= cores
