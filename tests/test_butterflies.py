"""Bipartite butterfly counting — hand-computed goldens on tiny
directed graphs, the src/dst duality, hub caps, and the global total
vs per-node credit invariant (sum of per-node counts == 2 * total)."""

from pyspark.sql import functions as F

from dachshund_spark.algorithms.butterflies import butterfly_counts, butterfly_total
from dachshund_spark.graph import LinkGraph


def _g(spark, edges):
    return LinkGraph(spark.createDataFrame(edges, "src long, dst long"))


def test_single_butterfly(spark):
    # s1,s2 -> d1,d2: exactly one butterfly; each dst credited once.
    g = _g(spark, [(1, 10), (1, 11), (2, 10), (2, 11)])
    got = {r.node_id: r.butterflies for r in butterfly_counts(g).collect()}
    assert got == {10: 1, 11: 1}
    src_side = {
        r.node_id: r.butterflies
        for r in butterfly_counts(g, side="src").collect()
    }
    assert src_side == {1: 1, 2: 1}
    tot = butterfly_total(g).collect()[0]
    assert tot.butterflies == 1
    assert tot.wedge_pairs == 1  # the single dst pair (10, 11)


def test_three_sources_choose_two(spark):
    # 3 sources all linking {10, 11}: the dst pair has k=3 shared
    # sources -> C(3,2)=3 butterflies on each dst endpoint.
    g = _g(
        spark,
        [(s, d) for s in (1, 2, 3) for d in (10, 11)],
    )
    got = {r.node_id: r.butterflies for r in butterfly_counts(g).collect()}
    assert got == {10: 3, 11: 3}
    assert butterfly_total(g).collect()[0].butterflies == 3


def test_wedges_without_butterflies_excluded(spark):
    # Pair (10,11) shares only source 1 (k=1): no butterfly, no row.
    g = _g(spark, [(1, 10), (1, 11), (2, 10), (3, 11)])
    assert butterfly_counts(g).count() == 0
    tot = butterfly_total(g).collect()[0]
    assert tot.butterflies == 0 and tot.wedge_pairs == 1


def test_duplicate_edges_counted_once(spark):
    g = _g(spark, [(1, 10), (1, 10), (1, 11), (2, 10), (2, 11), (2, 11)])
    got = {r.node_id: r.butterflies for r in butterfly_counts(g).collect()}
    assert got == {10: 1, 11: 1}


def test_center_degree_cap_drops_hub_wedges(spark):
    # Source 1 links 3 dsts (out-degree 3); capping at 2 removes all
    # of its wedges, killing the butterflies it closed.
    edges = [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11)]
    g = _g(spark, edges)
    assert butterfly_total(g).collect()[0].butterflies == 1
    capped = butterfly_total(g, max_center_degree=2).collect()[0]
    assert capped.butterflies == 0


def test_node_credit_is_twice_total(spark):
    # Denser fixture: K_{3,3} minus one edge.
    edges = [(s, d) for s in (1, 2, 3) for d in (10, 11, 12)][:-1]
    g = _g(spark, edges)
    total = butterfly_total(g).collect()[0].butterflies
    per_node = (
        butterfly_counts(g)
        .agg(F.sum("butterflies").alias("s"))
        .collect()[0]
        .s
    )
    assert per_node == 2 * total
    # K_{3,3} has C(3,2)^2 = 9 butterflies; removing edge (3,12)
    # kills the ones using both 3 and 12: pairs (10,12),(11,12) drop
    # from k=3 to k=2 and (10,11) keeps k=3 -> 3 + 1 + 1 = 5.
    assert total == 5


def test_multigraph_column(spark):
    df = spark.createDataFrame(
        [(0, 1, 10), (0, 1, 11), (0, 2, 10), (0, 2, 11), (7, 1, 10)],
        "graph_id long, src long, dst long",
    )
    got = butterfly_total(LinkGraph(df)).collect()
    by_g = {r.graph_id: r.butterflies for r in got}
    assert by_g[0] == 1 and by_g.get(7, 0) == 0


def test_bipartite_projection_weights_and_cap(spark):
    from dachshund_spark.algorithms.butterflies import bipartite_projection

    # groups: {1,2,3}, {1,2}, and a huge group that the cap drops whole
    rows = [(10, 1), (10, 2), (10, 3), (20, 1), (20, 2)]
    rows += [(99, i) for i in range(10)]
    df = spark.createDataFrame(rows, "g long, item long")
    got = {
        (r["item_a"], r["item_b"]): r["weight"]
        for r in bipartite_projection(
            df, group_col="g", item_col="item", max_group_size=5
        ).collect()
    }
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}
    # no cap: the big group's C(10,2) = 45 pairs subsume the small ones
    uncapped = bipartite_projection(
        df, group_col="g", item_col="item", max_group_size=None
    )
    assert uncapped.count() == 45
    w12 = uncapped.where("item_a = 1 and item_b = 2").collect()[0]["weight"]
    assert w12 == 3  # groups 10, 20, 99 all contain {1, 2}


def test_association_rules_hand_counts(spark):
    from dachshund_spark.algorithms.butterflies import association_rules

    # baskets: {1,2} x3, {1,3} x1  ->  N=4, n1=4, n2=3, n3=1
    rows = [(g, i) for g in (10, 20, 30) for i in (1, 2)] + [(40, 1), (40, 3)]
    df = spark.createDataFrame(rows, "g long, item long")
    out = {
        (r["item_a"], r["item_b"]): r
        for r in association_rules(
            df, group_col="g", item_col="item", min_weight=1
        ).collect()
    }
    r12 = out[(1, 2)]
    assert (r12["weight"], r12["n_a"], r12["n_b"]) == (3, 4, 3)
    assert r12["confidence"] == 3 / 4
    assert r12["lift"] == (4 * 3) / (4 * 3)
    assert out[(2, 1)]["confidence"] == 1.0  # 2 always implies 1
    assert out[(1, 3)]["lift"] == 4 * 1 / (4 * 1)
