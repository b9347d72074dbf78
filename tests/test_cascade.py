"""Independent cascade: live-edge equivalence + python replay."""

import hashlib
from collections import deque

from dachshund_spark.algorithms.trust import independent_cascade
from dachshund_spark.graph import LinkGraph


def _fires(seed, u, v, p):
    h = int(hashlib.md5(f"{seed}#ic#{u}#{v}".encode()).hexdigest()[:15], 16)
    return h % 100 < p


def _replay(edges, seeds, p, seed, rounds):
    live = {}
    for u, v in edges:
        if _fires(seed, u, v, p):
            live.setdefault(u, set()).add(v)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= rounds:
            continue
        for v in live.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _run(spark, edges, seeds, **kw):
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    return {
        r["node_id"]: r["round"]
        for r in independent_cascade(g, seeds, **kw).collect()
    }


def test_matches_python_replay(spark):
    edges = [((i * 3) % 17, (i * 5 + 1) % 17) for i in range(60)]
    got = _run(spark, edges, [0], p_percent=50, rounds=8, seed=7)
    assert got == _replay(edges, [0], 50, 7, 8)


def test_p_zero_activates_only_seeds(spark):
    edges = [(0, 1), (1, 2)]
    got = _run(spark, edges, [0], p_percent=0, rounds=4)
    assert got == {0: 0}


def test_p_hundred_is_bfs(spark):
    # all edges live -> rounds are exact BFS depths along the chain
    edges = [(i, i + 1) for i in range(5)]
    got = _run(spark, edges, [0], p_percent=100, rounds=8)
    assert got == {i: i for i in range(6)}


def test_round_budget_truncates(spark):
    edges = [(i, i + 1) for i in range(5)]
    got = _run(spark, edges, [0], p_percent=100, rounds=2)
    assert got == {0: 0, 1: 1, 2: 2}


def test_multiple_seeds_min_round_wins(spark):
    edges = [(i, i + 1) for i in range(6)]
    got = _run(spark, edges, [0, 4], p_percent=100, rounds=8)
    assert got[5] == 1 and got[3] == 3 and got[4] == 0


def test_interevent_burstiness_extremes(spark):
    from datetime import datetime

    from dachshund_spark.relational import interevent_burstiness

    def ev(uid, eid, sec):
        return (eid, datetime(2024, 1, 1, 0, 0, sec) if sec < 60 else
                datetime(2024, 1, 1, 0, sec // 60, sec % 60), uid)

    rows = [ev(1, i, i * 7) for i in range(8)]          # periodic: B = -1
    rows += [ev(2, 100 + i, s) for i, s in enumerate([0, 1, 2, 3, 500])]  # bursty
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    out = {r["user_id"]: r for r in interevent_burstiness(df).collect()}
    assert out[1]["burstiness"] == -1.0  # sigma = 0, exactly periodic
    assert out[1]["n_gaps"] == 7 and out[1]["sum_gap"] == 49
    # one huge gap: with n gaps B is capped at (sqrt(n-1)-1)/(sqrt(n-1)+1)
    # = 0.268 for n=4, so 0.264 IS near-maximal burstiness here
    assert out[2]["burstiness"] > 0.25
