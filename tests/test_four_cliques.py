"""4-clique enumeration and per-node counts."""

from itertools import combinations

from dachshund_spark.algorithms.triangles import (
    four_clique_counts,
    four_clique_list,
)
from dachshund_spark.graph import LinkGraph


def _brute(edges):
    adj = {}
    for u, v in edges:
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    nodes = sorted(adj)
    counts = {v: 0 for v in nodes}
    quads = set()
    for q in combinations(nodes, 4):
        if all(b in adj[a] for a, b in combinations(q, 2)):
            quads.add(q)
            for v in q:
                counts[v] += 1
    return quads, counts


def _graph(spark, edges):
    return LinkGraph(spark.createDataFrame(edges, "src long, dst long"))


def test_k5_has_five_k4s(spark):
    k5 = [(u, v) for u in range(5) for v in range(u + 1, 5)]
    quads = four_clique_list(_graph(spark, k5)).collect()
    assert len(quads) == 5
    got = {tuple(sorted((r["a"], r["b"], r["c"], r["d"]))) for r in quads}
    assert got == {q for q in combinations(range(5), 4)}
    counts = {
        r["node_id"]: r["cliques4"]
        for r in four_clique_counts(_graph(spark, k5)).collect()
    }
    assert counts == {v: 4 for v in range(5)}


def test_triangle_plus_pendant_has_none(spark):
    edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
    assert four_clique_list(_graph(spark, edges)).count() == 0
    counts = {
        r["node_id"]: r["cliques4"]
        for r in four_clique_counts(_graph(spark, edges)).collect()
    }
    assert counts == {0: 0, 1: 0, 2: 0, 3: 0}


def test_matches_brute_force_pseudorandom(spark):
    edges = [((i * 7) % 19, (i * i + 3) % 19) for i in range(110)]
    exp_quads, exp_counts = _brute(edges)
    g = _graph(spark, edges)
    got_quads = {
        tuple(sorted((r["a"], r["b"], r["c"], r["d"])))
        for r in four_clique_list(g).collect()
    }
    assert got_quads == exp_quads
    # exactly-once enumeration, not just as a set
    assert four_clique_list(g).count() == len(exp_quads)
    got_counts = {
        r["node_id"]: r["cliques4"] for r in four_clique_counts(g).collect()
    }
    assert got_counts == exp_counts


def test_multi_graph_isolation(spark):
    k4 = [(u, v) for u in range(4) for v in range(u + 1, 4)]
    rows = [(0, u, v) for u, v in k4] + [(1, u, v) for u, v in k4] + [(1, 0, 9)]
    g = LinkGraph(
        spark.createDataFrame(rows, "graph_id long, src long, dst long")
    )
    got = {
        (r["graph_id"], r["node_id"]): r["cliques4"]
        for r in four_clique_counts(g).collect()
    }
    assert got == {
        **{(0, v): 1 for v in range(4)},
        **{(1, v): 1 for v in range(4)},
        (1, 9): 0,
    }


def test_kclique_census_complete_k5(spark):
    from itertools import combinations

    from dachshund_spark.algorithms.triangles import kclique_counts_by_size
    from dachshund_spark.graph import LinkGraph
    from math import comb

    edges = spark.createDataFrame(
        [(a, b) for a, b in combinations(range(5), 2)], "src long, dst long"
    )
    got = {
        r["k"]: r["cliques"]
        for r in kclique_counts_by_size(LinkGraph(edges), max_k=6).collect()
    }
    assert got == {k: comb(5, k) for k in range(2, 7)}  # k=6 -> 0


def test_maximal_clique_census(spark):
    from itertools import combinations

    from dachshund_spark.algorithms.triangles import maximal_clique_counts
    from dachshund_spark.graph import LinkGraph

    # K5 plus a pendant edge: maximal cliques are K5 itself and the
    # pendant edge {4, 99}
    edges = [(a, b) for a, b in combinations(range(5), 2)] + [(4, 99)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["k"]: r["maximal_cliques"]
        for r in maximal_clique_counts(LinkGraph(df), max_k=6).collect()
    }
    assert got == {2: 1, 3: 0, 4: 0, 5: 1, 6: 0}
