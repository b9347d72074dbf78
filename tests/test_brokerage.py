from pyspark.sql import functions as F

from dachshund_spark import LinkGraph
from dachshund_spark.algorithms import brokerage_scores, open_two_paths
from tests.fixtures import KARATE_BROKERAGE, KARATE_EDGES


def test_karate_brokerage_golden(spark):
    # /root/reference/tests/karate_club.rs:507-577: directed karate,
    # communities 1 + (node_id <= 17)
    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    comm = g.nodes().withColumn(
        "community", F.when(F.col("node_id") <= 17, 2).otherwise(1)
    )
    out = {r.node_id: r for r in brokerage_scores(g, comm).collect()}
    for node in out:
        expected = KARATE_BROKERAGE.get(node, (0, 0, 0, 0, 0, 0))
        got = out[node]
        assert (
            got.coordinator,
            got.itinerant,
            got.representative,
            got.gatekeeper,
            got.liaison,
            got.open_twopaths,
        ) == expected, f"node {node}"


def test_open_two_paths_mutual_edge(spark):
    # a mutual tie a<->v produces the open path a->v->a (no a!=b filter,
    # /root/reference/src/dachshund/algorithms/brokerage.rs:44-47)
    g = LinkGraph.from_edgelist(spark, [(1, 2), (2, 1)])
    paths = open_two_paths(g).collect()
    assert {(p.a, p.v, p.b) for p in paths} == {(1, 2, 1), (2, 1, 2)}
