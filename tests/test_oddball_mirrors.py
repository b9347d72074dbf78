"""OddBall egonet features + host mirror census semantics."""

from itertools import combinations

from dachshund_spark.graph import LinkGraph
from dachshund_spark.algorithms.stats import oddball_ego
from dachshund_spark.pipeline.dedup import host_overlap_census

from tests.fixtures import KARATE_EDGES


def test_oddball_star_and_clique(spark):
    # node 0 is a pure star hub (no neighbor-neighbor edges);
    # nodes 10-13 form K4 (every egonet there is the whole clique)
    edges = [(0, i) for i in range(1, 6)] + [
        (a, b) for a, b in combinations(range(10, 14), 2)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node_id: r for r in oddball_ego(LinkGraph(df)).collect()}
    hub = got[0]
    assert (hub.n_ego, hub.e_ego, hub.tri) == (6, 5, 0)
    for n in range(10, 14):
        r = got[n]
        assert (r.n_ego, r.e_ego, r.tri) == (4, 6, 3)
        assert r.density == 1.0
    # a star leaf's egonet is a single edge
    assert (got[1].n_ego, got[1].e_ego, got[1].density) == (2, 1, 1.0)


def test_oddball_matches_brute_on_karate(spark):
    adj = {}
    for u, v in KARATE_EDGES:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    df = spark.createDataFrame(KARATE_EDGES, "src long, dst long")
    got = {r.node_id: (r.n_ego, r.e_ego) for r in oddball_ego(LinkGraph(df)).collect()}
    for u, nb in adj.items():
        e = len(nb) + sum(
            1 for a, b in combinations(sorted(nb), 2) if b in adj[a]
        )
        assert got[u] == (len(nb) + 1, e), u


def test_host_overlap_census(spark):
    rows = [
        ("a", "x"), ("a", "y"), ("a", "z"),
        ("b", "x"), ("b", "y"), ("b", "q"),
        ("c", "boiler"), ("d", "boiler"), ("c", "only-c"),
    ]
    docs = spark.createDataFrame(rows, "host string, text string")
    out = {(r.host_a, r.host_b): r for r in host_overlap_census(docs).collect()}
    ab = out[("a", "b")]
    assert (ab.n_shared, ab.n_a, ab.n_b) == (2, 3, 3)
    assert ab.jaccard == 2 / 4
    cd = out[("c", "d")]
    assert (cd.n_shared, cd.n_a, cd.n_b) == (1, 2, 1)
    assert set(out) == {("a", "b"), ("c", "d")}


def test_host_overlap_df_cap_drops_furniture(spark):
    # "boiler" appears on 5 hosts: with df_cap=4 it must not create pairs
    rows = [(h, "boiler") for h in "abcde"] + [("a", "u"), ("b", "u")]
    docs = spark.createDataFrame(rows, "host string, text string")
    out = {(r.host_a, r.host_b): r.n_shared
           for r in host_overlap_census(docs, df_cap=4).collect()}
    assert out == {("a", "b"): 1}
