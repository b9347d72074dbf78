"""Onion decomposition: brute-force replay + coreness consistency."""

from collections import defaultdict

from dachshund_spark.algorithms.coreness import coreness, onion_decomposition
from dachshund_spark.graph import LinkGraph


def _brute(edges):
    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    deg = {v: len(ns) for v, ns in adj.items()}
    out = {}
    layer, k = 0, 0
    while deg:
        layer += 1
        k = max(k, min(deg.values()))
        peel = [v for v, d in deg.items() if d <= k]
        for v in peel:
            out[v] = (k, layer)
        for v in peel:
            for u in adj[v]:
                if u in deg and u not in out:
                    deg[u] -= 1
            del deg[v]
    return out


def _run(spark, edges):
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    return {
        r["node_id"]: (r["coreness"], r["layer"])
        for r in onion_decomposition(g).collect()
    }


def test_star_isolates_center_last(spark):
    # leaves peel in pass 1; the center is then DEGREE 0 but must still
    # get a layer (2) and coreness 1 — the isolated-mid-peel path
    got = _run(spark, [(0, i) for i in range(1, 6)])
    assert got[0] == (1, 2)
    assert all(got[i] == (1, 1) for i in range(1, 6))


def test_clique_plus_tail(spark):
    k4 = [(u, v) for u in range(1, 5) for v in range(u + 1, 5)]
    edges = k4 + [(4, 10), (10, 11)]
    got = _run(spark, edges)
    assert got == _brute(edges)
    # tail peels before the clique; the clique goes in one final pass
    assert got[11][1] < got[1][1]
    assert got[1] == got[2] == got[3] == (3, got[1][1])


def test_matches_brute_force_pseudorandom(spark):
    edges = [((i * 7) % 29, (i * i + 3) % 29) for i in range(150)]
    got = _run(spark, edges)
    assert got == _brute(edges)


def test_coreness_agrees_with_classic_peel(spark):
    edges = [((i * 5) % 31, (i * i + 1) % 31) for i in range(140)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    onion = {
        r["node_id"]: r["coreness"] for r in onion_decomposition(g).collect()
    }
    classic = {r["node_id"]: r["coreness"] for r in coreness(g).collect()}
    # classic includes coreness-0 isolated rows; onion covers every
    # node that has an edge
    for v, c in onion.items():
        assert classic[v] == c


def test_multi_graph_isolation(spark):
    k4 = [(u, v) for u in range(1, 5) for v in range(u + 1, 5)]
    rows = [(0, u, v) for u, v in k4] + [(1, 1, 2), (1, 2, 3)]
    g = LinkGraph(
        spark.createDataFrame(rows, "graph_id long, src long, dst long")
    )
    got = {
        (r["graph_id"], r["node_id"]): (r["coreness"], r["layer"])
        for r in onion_decomposition(g).collect()
    }
    exp0 = _brute(k4)
    exp1 = _brute([(1, 2), (2, 3)])
    assert got == {
        **{(0, v): cl for v, cl in exp0.items()},
        **{(1, v): cl for v, cl in exp1.items()},
    }
