"""Absorbing-walk hit probability + event transition table."""

import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

from dachshund_spark.algorithms.trust import absorbing_hit_probability
from dachshund_spark.graph import LinkGraph
from dachshund_spark.relational import event_transitions

BARBELL = (
    [(u, v) for u in range(1, 5) for v in range(u + 1, 5)]
    + [(u, v) for u in range(5, 9) for v in range(u + 1, 9)]
    + [(4, 5)]
)


def _numpy_hit(edges, targets, absorbers, rounds):
    nodes = sorted({u for e in edges for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    adj = np.zeros((len(nodes), len(nodes)))
    for u, v in edges:
        adj[idx[u], idx[v]] = 1.0
        adj[idx[v], idx[u]] = 1.0
    deg = adj.sum(axis=1)
    h = np.array([1.0 if v in targets else 0.0 for v in nodes])
    for _ in range(rounds):
        nh = (adj.T @ h) / deg
        for v in nodes:
            if v in targets:
                nh[idx[v]] = 1.0
            elif v in absorbers:
                nh[idx[v]] = 0.0
        h = nh
    return {v: h[idx[v]] for v in nodes}


def test_matches_numpy_replay(spark):
    g = LinkGraph(spark.createDataFrame(BARBELL, "src long, dst long"))
    out = absorbing_hit_probability(g, [8], [1], rounds=4).collect()
    exp = _numpy_hit(BARBELL, {8}, {1}, 4)
    got = {r["node_id"]: (r["cls"], r["hit_prob"]) for r in out}
    for v, h in exp.items():
        cls = "target" if v == 8 else "absorber" if v == 1 else "free"
        assert got[v] == (cls, round(h, 8))


def test_boundary_frozen_and_side_separation(spark):
    g = LinkGraph(spark.createDataFrame(BARBELL, "src long, dst long"))
    got = {
        r["node_id"]: r["hit_prob"]
        for r in absorbing_hit_probability(g, [8], [1], rounds=6).collect()
    }
    assert got[8] == 1.0 and got[1] == 0.0
    # nodes inside the target clique sit closer to the target than
    # nodes inside the absorber clique
    assert min(got[6], got[7]) > max(got[2], got[3])


def test_overlap_rejected(spark):
    g = LinkGraph(spark.createDataFrame(BARBELL, "src long, dst long"))
    with pytest.raises(ValueError, match="overlap"):
        absorbing_hit_probability(g, [1, 2], [2, 3], rounds=2)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, 1, 0, 0, i), u, t, 0.0, "{}")
            for i, (u, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def test_event_transitions_hand_computed(spark):
    rows = [
        (1, "view"), (1, "click"), (1, "view"),
        (2, "view"), (2, "view"),
    ]
    got = {
        (r["src_type"], r["dst_type"]): (r["c"], r["prob"])
        for r in event_transitions(_ev(spark, rows)).collect()
    }
    # user 1: view->click, click->view; user 2: view->view
    assert got == {
        ("view", "click"): (1, 1 / 2),
        ("view", "view"): (1, 1 / 2),
        ("click", "view"): (1, 1.0),
    }


def test_event_transitions_single_events_excluded(spark):
    rows = [(1, "error"), (2, "view"), (2, "click")]
    got = event_transitions(_ev(spark, rows)).collect()
    assert {(r["src_type"], r["dst_type"]) for r in got} == {("view", "click")}
