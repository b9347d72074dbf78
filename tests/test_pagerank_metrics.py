"""pagerank metrics_sink: per-superstep residual + message count."""

from dachshund_spark.algorithms import pagerank
from dachshund_spark.graph import LinkGraph
from tests.fixtures import KARATE_EDGES


def test_fixed_iterations_sink(spark):
    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    n = g.nodes().count()
    sink = []
    pagerank(g, fixed_iterations=5, metrics_sink=sink).count()
    assert len(sink) == 5
    assert all(m["message_count"] == n for m in sink)
    # geometric damping: residuals strictly shrink after the first step
    res = [m["residual_e8"] for m in sink]
    assert all(a > b for a, b in zip(res[1:], res[2:]))
    assert res[-1] < res[0]
    assert all(m["l1_diff"] >= 0 for m in sink)


def test_tol_path_still_stops_and_records(spark):
    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    sink = []
    pagerank(g, tol=1e-4, metrics_sink=sink).count()
    assert sink, "tol path must record metrics"
    assert sink[-1]["l1_diff"] < 1e-4
