"""Deterministic random-walk corpus generation."""

import pytest

from dachshund_spark import LinkGraph
from dachshund_spark.walks import node2vec_walks, random_walks
from tests.fixtures import KARATE_EDGES


def test_walks_are_valid_paths_and_deterministic(spark):
    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    und = {(r.src, r.dst) for r in g.undirected_edges().collect()}
    out1 = {(r.start_node, r.walk_idx): r.walk
            for r in random_walks(g, walk_length=5, walks_per_node=2, seed=3).collect()}
    out2 = {(r.start_node, r.walk_idx): r.walk
            for r in random_walks(g, walk_length=5, walks_per_node=2, seed=3).collect()}
    assert out1 == out2  # bit-for-bit reproducible
    assert len(out1) == 34 * 2
    for (start, _), walk in out1.items():
        hops = [int(x) for x in walk.split("->")]
        assert hops[0] == start and len(hops) == 5
        for a, b in zip(hops, hops[1:]):
            assert (a, b) in und  # every hop is a real edge
    # a different seed changes at least some walks
    out3 = {(r.start_node, r.walk_idx): r.walk
            for r in random_walks(g, walk_length=5, walks_per_node=2, seed=4).collect()}
    assert out3 != out1


def test_node2vec_valid_paths_and_deterministic(spark):
    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    und = {(r.src, r.dst) for r in g.undirected_edges().collect()}
    kw = dict(walk_length=5, walks_per_node=2, p=2.0, q=0.5, seed=3)
    out1 = {(r.start_node, r.walk_idx): r.walk
            for r in node2vec_walks(g, **kw).collect()}
    out2 = {(r.start_node, r.walk_idx): r.walk
            for r in node2vec_walks(g, **kw).collect()}
    assert out1 == out2  # bit-for-bit reproducible
    assert len(out1) == 34 * 2
    for (start, _), walk in out1.items():
        hops = [int(x) for x in walk.split("->")]
        assert hops[0] == start and len(hops) == 5
        for a, b in zip(hops, hops[1:]):
            assert (a, b) in und


def _return_rate(g, p, q, seed=7):
    """Fraction of steps t≥2 that return to the node visited at t-2."""
    ret = tot = 0
    for r in node2vec_walks(
        g, walk_length=6, walks_per_node=4, p=p, q=q, seed=seed
    ).collect():
        path = [int(x) for x in r.walk.split("->")]
        for i in range(2, len(path)):
            tot += 1
            ret += path[i] == path[i - 2]
    return ret / tot


def test_node2vec_p_bias_controls_returns(spark):
    """Small p → 1/p return weight dominates → walks bounce back;
    large p suppresses returns (Grover & Leskovec 2016 semantics)."""
    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    assert _return_rate(g, p=0.1, q=1.0) > 3 * _return_rate(g, p=10.0, q=1.0)


def test_node2vec_rejects_bad_params(spark):
    g = LinkGraph.from_edgelist(spark, [(1, 2)])
    with pytest.raises(ValueError):
        node2vec_walks(g, p=0.0)
    with pytest.raises(ValueError):
        node2vec_walks(g, q=-1.0)
    with pytest.raises(ValueError):
        node2vec_walks(g, p=1e9)  # weight rounds to 0


def test_node2vec_walk_length_one(spark):
    g = LinkGraph.from_edgelist(spark, [(1, 2)])
    out = {r.start_node: r.walk
           for r in node2vec_walks(g, walk_length=1).collect()}
    assert out == {1: "1", 2: "2"}


def test_walk_stops_at_sink(spark):
    # directed 1->2 with no edge out of 3's component... use isolated
    # pair where node has a single neighbor: walk bounces (symmetric)
    g = LinkGraph.from_edgelist(spark, [(1, 2)])
    out = {r.start_node: r.walk for r in random_walks(g, walk_length=4).collect()}
    assert out[1] == "1->2->1->2" and out[2] == "2->1->2->1"


def test_skipgram_pairs_window_semantics(spark):
    """One walk 1->2->3->4, window 2: positional pair counts by hand."""
    from dachshund_spark.walks import skipgram_pairs

    w = spark.createDataFrame(
        [(1, 0, "1->2->3->4")], "start_node long, walk_idx long, walk string"
    )
    out = {(r.center, r.context): r.cnt for r in skipgram_pairs(w, window=2).collect()}
    expected = {}
    seq = [1, 2, 3, 4]
    for i, c in enumerate(seq):
        for j, x in enumerate(seq):
            if i != j and abs(i - j) <= 2:
                expected[(c, x)] = expected.get((c, x), 0) + 1
    assert out == expected
    # window 1 keeps only adjacent pairs; counts accumulate over walks
    w2 = spark.createDataFrame(
        [(1, 0, "1->2"), (1, 1, "1->2")],
        "start_node long, walk_idx long, walk string",
    )
    out2 = {(r.center, r.context): r.cnt for r in skipgram_pairs(w2, window=1).collect()}
    assert out2 == {(1, 2): 2, (2, 1): 2}
    with pytest.raises(ValueError):
        skipgram_pairs(w, window=0)


def test_node2vec_keeps_self_loop_only_start_nodes(spark):
    from dachshund_spark.graph import LinkGraph
    from dachshund_spark.walks import node2vec_walks, random_walks

    # node 9 has only a self-loop: it must still emit a length-1 walk,
    # matching random_walks' sink semantics
    g = LinkGraph(
        spark.createDataFrame([(1, 2), (9, 9)], "src long, dst long")
    )
    n2v = {r.start_node: r.walk for r in
           node2vec_walks(g, walk_length=3, walks_per_node=1).collect()}
    assert n2v[9] == "9"
    rw = {r.start_node: r.walk for r in
          random_walks(g, walk_length=3, walks_per_node=1).collect()}
    assert set(n2v) == set(rw)
