"""Bond percolation curve + vertex cover validity on karate."""

from pyspark.sql import functions as F

from dachshund_spark.algorithms.matching import vertex_cover_2approx
from dachshund_spark.algorithms.stats import bond_percolation
from dachshund_spark.graph import LinkGraph
from tests.fixtures import KARATE_EDGES


def test_vertex_cover_covers_every_edge(spark):
    g = LinkGraph(spark.createDataFrame(KARATE_EDGES, ["src", "dst"]))
    cover = {r["node_id"] for r in vertex_cover_2approx(g).collect()}
    assert all(u in cover or v in cover for u, v in KARATE_EDGES)
    # 2-approx bound: karate's optimum cover is 14
    assert len(cover) <= 28


def test_percolation_curve_is_monotone_coupled(spark):
    g = LinkGraph(spark.createDataFrame(KARATE_EDGES, ["src", "dst"]))
    rows = {r["p_pct"]: r for r in bond_percolation(g).collect()}
    assert set(rows) == {25, 50, 75}
    # coupling ⇒ monotone in every statistic
    for a, b in ((25, 50), (50, 75)):
        assert rows[a]["n_edges"] <= rows[b]["n_edges"]
        assert rows[a]["n_nodes"] <= rows[b]["n_nodes"]
        assert rows[a]["largest_cc"] <= rows[b]["largest_cc"]
    assert rows[75]["n_edges"] < 78  # something actually dropped


def test_articulation_points_known_graph(spark):
    from dachshund_spark.algorithms.stats import articulation_points
    from dachshund_spark.graph import LinkGraph

    # path 0-1-2-3 + triangle 3-4-5: cut vertices are 1, 2, 3
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 3)], "src long, dst long"
    )
    out = {r["node_id"]: r for r in
           articulation_points(LinkGraph(e), cc_rounds=8).collect()}
    assert {n for n, r in out.items() if r["is_articulation"]} == {1, 2, 3}
    # removing 1 isolates 0 (counted as isolated, not a component)
    assert out[1]["n_components"] == 1 and out[1]["n_isolated"] == 1
    # star: the center is the only cut vertex and all leaves isolate
    star = spark.createDataFrame([(0, i) for i in (1, 2, 3)], "src long, dst long")
    sout = {r["node_id"]: r for r in
            articulation_points(LinkGraph(star), cc_rounds=4).collect()}
    assert sout[0]["n_components"] == 0 and sout[0]["n_isolated"] == 3
    assert {n for n, r in sout.items() if r["is_articulation"]} == {0}


def test_bridges_known_graph(spark):
    from dachshund_spark.algorithms.stats import bridges
    from dachshund_spark.graph import LinkGraph

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 3)], "src long, dst long"
    )
    out = {(r["src"], r["dst"]): r for r in
           bridges(LinkGraph(e), cc_rounds=8).collect()}
    assert {k for k, r in out.items() if r["is_bridge"]} == {(0, 1), (1, 2), (2, 3)}
    # deleting (0,1) isolates endpoint 0 (degree 1)
    assert out[(0, 1)]["n_isolated"] == 1 and out[(0, 1)]["n_components"] == 1
    # triangle edges are cycle edges
    assert out[(3, 4)]["is_bridge"] == 0


def test_bridges_big_ids_no_key_collision(spark):
    """ADVICE r3: fixed 2^20 packing collided deleted-edge keys for node
    ids ≥ 2^20 — edge (1, 2^20+5) and edge (2, 5) both packed to
    2^21+5, silently merging two what-if deletions.  The shift now
    derives from the observed max id; on this tree every edge must be
    a bridge."""
    from dachshund_spark.algorithms.stats import bridges
    from dachshund_spark.graph import LinkGraph

    big = (1 << 20) + 5
    e = spark.createDataFrame(
        [(1, big), (5, big), (2, 5)], "src long, dst long"
    )
    out = {(r["src"], r["dst"]): r["is_bridge"]
           for r in bridges(LinkGraph(e), cc_rounds=8).collect()}
    assert all(out.values()) and len(out) == 3, out


def test_bridges_overflowing_ids_raise(spark):
    from dachshund_spark.algorithms.stats import bridges
    from dachshund_spark.graph import LinkGraph
    import pytest as _pytest

    e = spark.createDataFrame([(1, 1 << 32)], "src long, dst long")
    with _pytest.raises(ValueError, match="renumber"):
        bridges(LinkGraph(e), cc_rounds=2)
