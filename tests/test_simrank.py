"""SimRank vs a direct numpy replay of the fixed-point recurrence."""

import pytest

from dachshund_spark.graph import LinkGraph

E10 = 10_000_000_000


def _replay(edges, nodes, decay, iters):
    """Exact integer-state replay of the implementation contract."""
    inn = {v: [u for (u, w) in edges if w == v] for v in nodes}
    s = {(v, v): E10 for v in nodes}
    for _ in range(iters):
        nxt = {(v, v): E10 for v in nodes}
        for a in nodes:
            for b in nodes:
                if a == b or not inn[a] or not inn[b]:
                    continue
                tot = sum(
                    s.get((i, j), 0) for i in inn[a] for j in inn[b]
                )
                val = int(round((decay / (len(inn[a]) * len(inn[b]))) * tot))
                if val > 0:
                    nxt[(a, b)] = val
        s = nxt
    return s


def test_simrank_matches_replay(spark):
    from dachshund_spark.algorithms.simrank import simrank

    # Jeh & Widom's university example: Univ->ProfA/ProfB,
    # ProfA->StudA, StudA->Univ, ProfB->StudB, StudB->ProfB
    E = [(0, 1), (0, 2), (1, 3), (3, 0), (2, 4), (4, 2)]
    nodes = [0, 1, 2, 3, 4]
    g = LinkGraph(spark.createDataFrame(E, "src long, dst long"))
    got = {
        (r.node_a, r.node_b): r.simrank_e10
        for r in simrank(g, decay=0.75, fixed_iterations=5).collect()
    }
    want = {
        (a, b): v
        for (a, b), v in _replay(E, nodes, 0.75, 5).items()
        if a < b and v > 0
    }
    assert got == want
    # ProfA(1) and ProfB(2) share in-neighbor Univ -> similar
    assert got[(1, 2)] > 0


def test_simrank_validation(spark):
    from dachshund_spark.algorithms.simrank import simrank

    gg = LinkGraph(
        spark.createDataFrame([(0, 1, 2)], "graph_id long, src long, dst long")
    )
    with pytest.raises(ValueError):
        simrank(gg)
    g = LinkGraph(spark.createDataFrame([(1, 2)], "src long, dst long"))
    with pytest.raises(ValueError):
        simrank(g, decay=1.0)


def test_simrank_disconnected_pairs_absent(spark):
    from dachshund_spark.algorithms.simrank import simrank

    # two disjoint 2-cycles: cross-component pairs never become similar
    E = [(0, 1), (1, 0), (10, 11), (11, 10)]
    g = LinkGraph(spark.createDataFrame(E, "src long, dst long"))
    got = {
        (r.node_a, r.node_b)
        for r in simrank(g, fixed_iterations=4).collect()
    }
    assert all(a < 10 and b < 10 or a >= 10 and b >= 10 for a, b in got)
