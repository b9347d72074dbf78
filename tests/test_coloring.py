"""Speculative greedy coloring — validity (proper coloring), greedy
compactness (colors form 0..k with every node blocked from lower
colors), determinism, fixed-round NULL semantics, and multigraph."""

from pyspark.sql import functions as F

from dachshund_spark.algorithms.coloring import speculative_coloring
from dachshund_spark.graph import LinkGraph
from tests.fixtures import KARATE_EDGES


def _colors(spark, edges, **kw):
    g = LinkGraph.from_edgelist(spark, edges)
    return {r.node_id: r.color for r in speculative_coloring(g, **kw).collect()}


def _assert_proper(edges, colors):
    for u, v in edges:
        if u != v:
            assert colors[u] != colors[v], f"edge ({u},{v}) monochromatic"


def test_path_two_colors(spark):
    edges = [(1, 2), (2, 3), (3, 4)]
    colors = _colors(spark, edges)
    _assert_proper(edges, colors)
    assert set(colors.values()) <= {0, 1}


def test_clique_needs_k_colors(spark):
    edges = [(u, v) for u in range(1, 5) for v in range(u + 1, 5)]
    colors = _colors(spark, edges)
    _assert_proper(edges, colors)
    assert sorted(colors.values()) == [0, 1, 2, 3]


def test_karate_valid_and_greedy(spark):
    colors = _colors(spark, KARATE_EDGES)
    _assert_proper(KARATE_EDGES, colors)
    assert all(c is not None for c in colors.values())
    # greedy compactness: every node with color c > 0 must see all of
    # 0..c-1 on its neighbors (otherwise mex would have picked lower).
    adj = {}
    for u, v in KARATE_EDGES:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    for n, c in colors.items():
        seen = {colors[m] for m in adj[n]}
        assert set(range(c)) <= seen, f"node {n} color {c} skips a hole"


def test_deterministic(spark):
    a = _colors(spark, KARATE_EDGES, seed=7)
    b = _colors(spark, KARATE_EDGES, seed=7)
    assert a == b


def test_fixed_rounds_leaves_nulls_then_resolves(spark):
    # K4: four mutually adjacent nodes all want color 0 in round 1;
    # exactly one wins per round on this clique, so rounds=1 leaves
    # unresolved NULLs while rounds=None finishes.
    edges = [(u, v) for u in range(1, 5) for v in range(u + 1, 5)]
    partial = _colors(spark, edges, rounds=1)
    assert sum(c is None for c in partial.values()) >= 1
    full = _colors(spark, edges)
    assert all(c is not None for c in full.values())
    # committed colors never change in later rounds
    for n, c in partial.items():
        if c is not None:
            assert full[n] == c


def test_isolated_selfloop_node_gets_color_zero(spark):
    colors = _colors(spark, [(1, 2), (3, 3)])
    assert colors[3] == 0
    assert colors[1] != colors[2]


def test_multigraph_column(spark):
    df = spark.createDataFrame(
        [(0, 1, 2), (0, 2, 3), (9, 1, 2)],
        "graph_id long, src long, dst long",
    )
    out = speculative_coloring(LinkGraph(df)).collect()
    by = {(r.graph_id, r.node_id): r.color for r in out}
    assert by[(0, 1)] != by[(0, 2)] and by[(0, 2)] != by[(0, 3)]
    assert by[(9, 1)] != by[(9, 2)]
