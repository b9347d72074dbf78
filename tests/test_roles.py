"""ReFeX recursive features — hand-checked on a path + cross-checked
against a pure-Python recompute on karate."""

from collections import defaultdict

import pytest

from dachshund_spark.algorithms.roles import refex_features
from dachshund_spark.graph import LinkGraph
from tests.fixtures import KARATE_EDGES


def _refex_py(edges, rounds=2):
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tri = {
        u: sum(1 for v in adj[u] for w in adj[u] if v < w and w in adj[v])
        for u in adj
    }
    feats = {u: [len(adj[u]), tri[u]] for u in adj}
    width = 2
    for _ in range(rounds):
        prev = {u: f[-width:] for u, f in feats.items()}
        for u in adj:
            sums = [0] * width
            for v in adj[u]:
                for i in range(width):
                    sums[i] += prev[v][i]
            feats[u] = feats[u] + sums
    return feats


def test_refex_path_graph_by_hand(spark):
    # path 1-2-3: degrees (1,2,1), no triangles
    g = LinkGraph(spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"]))
    got = {
        r["node_id"]: [
            int(r[c])
            for c in [
                "degree",
                "triangles",
                "s1_degree",
                "s1_triangles",
                "s2_degree",
                "s2_triangles",
            ]
        ]
        for r in refex_features(g, rounds=2).collect()
    }
    assert got == {
        1: [1, 0, 2, 0, 2, 0],
        2: [2, 0, 2, 0, 4, 0],
        3: [1, 0, 2, 0, 2, 0],
    }


def test_refex_matches_python_on_karate(spark):
    g = LinkGraph(spark.createDataFrame(KARATE_EDGES, ["src", "dst"]))
    cols = [
        "degree",
        "triangles",
        "s1_degree",
        "s1_triangles",
        "s2_degree",
        "s2_triangles",
    ]
    got = {
        r["node_id"]: [int(r[c]) for c in cols]
        for r in refex_features(g, rounds=2).collect()
    }
    assert got == _refex_py(KARATE_EDGES, rounds=2)
