"""Louvain-style synchronized local moving (algorithms/louvain.py).

Semantics pinned by the integer gain key 2m·e_ic − k_i·vol'_c and the
even-round anti-swap restriction; the driver oracle `louvain_8` replays
every round in SQL. These tests cover the structural guarantees.
"""

import pytest
from pyspark.sql import functions as F

from dachshund_spark import LinkGraph
from dachshund_spark.algorithms.louvain import louvain_move
from tests.fixtures import TWO_KARATE


def _labels(out):
    return {r.node_id: r.label for r in out.collect()}


def test_two_triangles_bridge(spark):
    # two triangles joined by one bridge edge: each triangle is one
    # community, the bridge does not merge them
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    lab = _labels(louvain_move(LinkGraph.from_edgelist(spark, edges), rounds=8))
    assert len({lab[0], lab[1], lab[2]}) == 1
    assert len({lab[3], lab[4], lab[5]}) == 1
    assert lab[0] != lab[3]


def test_planted_partition_recovered(spark):
    # 3 blocks of 8 nodes: dense inside (complete), sparse across (one
    # edge between consecutive blocks) — Louvain must find the blocks
    edges = []
    for b in range(3):
        base = b * 8
        edges += [(base + i, base + j) for i in range(8) for j in range(i + 1, 8)]
    edges += [(7, 8), (15, 16)]
    lab = _labels(louvain_move(LinkGraph.from_edgelist(spark, edges), rounds=8))
    blocks = [{lab[b * 8 + i] for i in range(8)} for b in range(3)]
    assert all(len(s) == 1 for s in blocks)
    assert len({next(iter(s)) for s in blocks}) == 3


def test_deterministic(spark):
    g = LinkGraph.from_edgelist(spark, TWO_KARATE)
    a = set(map(tuple, louvain_move(g, rounds=4).collect()))
    b = set(map(tuple, louvain_move(g, rounds=4).collect()))
    assert a == b


def test_labels_stay_within_component(spark):
    # labels are node ids, moves only follow edges — a node's label
    # must belong to its own connected component
    edges = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
    lab = _labels(louvain_move(LinkGraph.from_edgelist(spark, edges), rounds=6))
    assert all(lab[n] in (0, 1, 2) for n in (0, 1, 2))
    assert all(lab[n] in (10, 11, 12) for n in (10, 11, 12))


def test_multigraph_frames_independent(spark):
    tri = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    df = spark.createDataFrame(
        [(gid, a, b) for gid in (0, 1) for a, b in tri],
        "graph_id long, src long, dst long",
    )
    out = louvain_move(LinkGraph(df), rounds=8)
    per = {
        gid: {r.node_id: r.label for r in out.where(F.col("graph_id") == gid).collect()}
        for gid in (0, 1)
    }
    assert per[0] == per[1]
    assert len({per[0][0], per[0][1], per[0][2]}) == 1


def test_positive_modularity_on_karate(spark):
    from dachshund_spark.algorithms.stats import modularity

    g = LinkGraph.from_edgelist(spark, TWO_KARATE)
    labels = louvain_move(g, rounds=8)
    q = modularity(g, labels).collect()[0]["modularity"]
    assert q > 0.25  # karate's optimum is ~0.42; local moving gets close
