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
