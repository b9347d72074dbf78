import pytest
from pyspark.sql import functions as F

from dachshund_spark import LinkGraph
from dachshund_spark.algorithms import label_propagation
from tests.fixtures import TWO_KARATE


def test_two_cliques_converge_to_two_labels(spark):
    # two disjoint K5s: LPA must settle on one label per clique
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    edges += [(a + 10, b + 10) for a, b in edges]
    g = LinkGraph.from_edgelist(spark, edges)
    out = label_propagation(g, iterations=5)
    labels = {r.node_id: r.label for r in out.collect()}
    assert len({labels[i] for i in range(5)}) == 1
    assert len({labels[i + 10] for i in range(5)}) == 1
    assert labels[0] != labels[10]


def test_deterministic(spark):
    g = LinkGraph.from_edgelist(spark, TWO_KARATE)
    a = {(r.node_id, r.label) for r in label_propagation(g, iterations=4).collect()}
    b = {(r.node_id, r.label) for r in label_propagation(g, iterations=4).collect()}
    assert a == b


def test_labels_stay_within_component(spark):
    g = LinkGraph.from_edgelist(spark, TWO_KARATE)
    out = label_propagation(g, iterations=6)
    # labels from the shifted copy (+35) can never leak into the first club
    bad = out.where((F.col("node_id") <= 34) & (F.col("label") > 34)).count()
    assert bad == 0


def test_isolated_node_keeps_label(spark):
    g = LinkGraph.from_edgelist(spark, [(1, 2)])
    out = {r.node_id: r.label for r in label_propagation(g, iterations=3).collect()}
    # 1 and 2 swap/settle between {1,2}; both present
    assert set(out) == {1, 2}


def test_hub_aware_salted_count_equivalence_10m(spark):
    """Hub-aware salted_count == plain groupBy-count on a 10^7-edge
    power-law frame (the LPA message-count reducer shape)."""
    from dachshund_spark import LinkGraph
    from dachshund_spark.skew import salted_count, top_degree_hubs

    g = LinkGraph.powerlaw_graph(spark, 100_000, 10_000_000, seed=5)
    e = g.edges
    deg = e.groupBy(F.col("dst").alias("node_id")).agg(
        F.count("*").alias("degree")
    )
    hubs = top_degree_hubs(deg, 50_000).withColumnRenamed("node_id", "dst")
    assert hubs.count() > 0, "fixture must actually contain hubs"
    flagged = e.join(
        F.broadcast(hubs.withColumn("_h", F.lit(True))), "dst", "left"
    ).withColumn("_h", F.coalesce("_h", F.lit(False)))
    expect = {
        r.dst: r.c
        for r in flagged.groupBy("dst").agg(F.count("*").alias("c"))
        .where(F.col("c") >= 40_000).collect()
    }
    got = {
        r.dst: r.c
        for r in salted_count(flagged, ["dst"], "c", 16, hub_flag="_h")
        .where(F.col("c") >= 40_000).collect()
    }
    assert got == expect


def test_lpa_salted_equals_plain(spark):
    """LPA with hub-aware salted message counts must produce identical
    labels to the plain path on a hub-heavy graph."""
    from dachshund_spark import LinkGraph
    from dachshund_spark.algorithms import label_propagation

    g = LinkGraph.powerlaw_graph(spark, n_nodes=2_000, n_edges=12_000, seed=3)
    plain = {
        r.node_id: r.label
        for r in label_propagation(g, iterations=4).collect()
    }
    salted = {
        r.node_id: r.label
        for r in label_propagation(
            g, iterations=4, num_salts=8, hub_threshold=10
        ).collect()
    }
    assert salted == plain
    with pytest.raises(ValueError):
        label_propagation(g, iterations=2, hub_threshold=10)  # needs num_salts


def test_weighted_lpa_weight_flips_modal_label(spark):
    from dachshund_spark.algorithms.lpa import label_propagation

    # node 10 has two neighbors labeled 1 (weight 1 each) and one
    # neighbor labeled 2 with weight 5: unweighted LPA picks 1
    # (count 2 > 1), weighted picks 2 (weight 5 > 2)
    edges = [(1, 10, 1), (11, 10, 1), (2, 10, 5), (1, 11, 1)]
    df = spark.createDataFrame(edges, "src long, dst long, wt long")
    g = LinkGraph(df, extra_cols=["wt"])
    unw = {r.node_id: r.label for r in
           label_propagation(g, iterations=1).collect()}
    assert unw[10] == 1
    w = {r.node_id: r.label for r in
         label_propagation(g, iterations=1, weight_col="wt").collect()}
    assert w[10] == 2


def test_weighted_lpa_uniform_weights_equal_unweighted(spark):
    from dachshund_spark.algorithms.lpa import label_propagation
    from tests.fixtures import KARATE_EDGES

    df = spark.createDataFrame(KARATE_EDGES, "src long, dst long").withColumn(
        "wt", F.lit(1).cast("long")
    )
    g = LinkGraph(df, extra_cols=["wt"])
    unw = sorted(
        (r.node_id, r.label)
        for r in label_propagation(g, iterations=3).collect()
    )
    w = sorted(
        (r.node_id, r.label)
        for r in label_propagation(g, iterations=3, weight_col="wt").collect()
    )
    assert unw == w
