"""Rich-club coefficient: brute-force replay + hand goldens."""

from collections import defaultdict

from dachshund_spark.algorithms.stats import rich_club
from dachshund_spark.graph import LinkGraph


def _brute(edges):
    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    deg = {v: len(ns) for v, ns in adj.items()}
    out = {}
    for k in sorted(set(deg.values())):
        club = {v for v, d in deg.items() if d > k}
        if len(club) < 2:
            continue
        e = sum(
            1
            for u in club
            for v in adj[u]
            if v in club and u < v
        )
        out[k] = (
            len(club),
            e,
            round(2.0 * e / (len(club) * (len(club) - 1)), 8),
        )
    return out


def _run(spark, edges):
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    return {
        r["k"]: (r["n_nodes"], r["n_edges"], r["phi"])
        for r in rich_club(g).collect()
    }


def test_clique_with_pendant(spark):
    k4 = [(u, v) for u in range(1, 5) for v in range(u + 1, 5)]
    got = _run(spark, k4 + [(1, 5)])
    # only k=1 has a club of >=2 nodes: the K4, density exactly 1
    assert got == {1: (4, 6, 1.0)}


def test_path_graph(spark):
    got = _run(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: (2, 1, 1.0)}


def test_matches_brute_force(spark):
    # deterministic pseudo-random graph, multi-edges + self-loops mixed
    edges = [((i * 7) % 23, (i * i + 3) % 23) for i in range(120)]
    got = _run(spark, edges)
    assert got == _brute(edges)


def test_multi_graph_isolation(spark):
    k4 = [(u, v) for u in range(1, 5) for v in range(u + 1, 5)]
    rows = [(0, u, v) for u, v in k4 + [(1, 5)]] + [
        (1, u, v) for u, v in [(1, 2), (2, 3), (3, 4)]
    ]
    g = LinkGraph(
        spark.createDataFrame(rows, "graph_id long, src long, dst long")
    )
    got = {
        (r["graph_id"], r["k"]): (r["n_nodes"], r["n_edges"], r["phi"])
        for r in rich_club(g).collect()
    }
    assert got == {(0, 1): (4, 6, 1.0), (1, 1): (2, 1, 1.0)}


def test_degree_quantiles_exact(spark):
    from dachshund_spark.algorithms.stats import degree_quantiles

    # degrees: star center 10, leaves 1..10 each degree 1 -> n=11
    star = [(0, i) for i in range(1, 11)]
    g = LinkGraph(spark.createDataFrame(star, "src long, dst long"))
    got = {
        r["q"]: (r["rank"], r["degree"])
        for r in degree_quantiles(g).collect()
    }
    # sorted degrees: [1]*10 + [10]; ceil(.5*11)=6 -> 1; ceil(.9*11)=10
    # -> 1; ceil(.99*11)=11 -> 10; p100 rank 11 -> 10
    assert got == {
        "p50": (6, 1), "p90": (10, 1), "p99": (11, 10), "p100": (11, 10)
    }


def test_degree_quantiles_match_sorted_list(spark):
    import math

    from dachshund_spark.algorithms.stats import degree_quantiles

    edges = [((i * 7) % 40, (i * i + 3) % 40) for i in range(200)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    degs = sorted(r["degree"] for r in g.degrees().collect())
    got = {r["q"]: r["degree"] for r in degree_quantiles(g).collect()}
    for q, frac in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99), ("p100", 1.0)):
        assert got[q] == degs[math.ceil(frac * len(degs)) - 1], q


def test_exact_quantiles_grouped(spark):
    from dachshund_spark.algorithms.stats import exact_quantiles

    rows = [("en", v) for v in range(1, 101)] + [("de", v) for v in (5, 5, 7)]
    df = spark.createDataFrame(rows, "lang string, n_chars long")
    out = {
        (r.lang, r.q): (r.rank, r.n_chars)
        for r in exact_quantiles(df, "n_chars", group_cols=["lang"]).collect()
    }
    # en: 1..100 -> p50 = ceil(.5*100)=rank 50 -> 50; p90 -> 90; p99 -> 99; p100 -> 100
    assert out[("en", "p50")] == (50, 50)
    assert out[("en", "p90")] == (90, 90)
    assert out[("en", "p99")] == (99, 99)
    assert out[("en", "p100")] == (100, 100)
    # de: [5,5,7] -> p50 rank ceil(1.5)=2 -> 5; p100 rank 3 -> 7
    assert out[("de", "p50")] == (2, 5)
    assert out[("de", "p100")] == (3, 7)
