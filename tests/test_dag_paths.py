"""Condensation-DAG path counts vs hand-counted fixtures."""

from dachshund_spark.graph import LinkGraph
from dachshund_spark.algorithms.scc import dag_path_counts


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.scc_id: r.path_count for r in dag_path_counts(LinkGraph(df)).collect()}


def test_diamond_counts(spark):
    # 0 -> {1,2} -> 3 -> 4: two paths reach 3 and 4, one source
    got = _run(spark, [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)])
    assert got == {0: 1, 1: 1, 2: 1, 3: 2, 4: 2}


def test_cycle_collapses_to_one_component(spark):
    # 0 -> (1<->2 cycle) -> 3; the cycle is one SCC labeled min member
    got = _run(spark, [(0, 1), (1, 2), (2, 1), (2, 3)])
    assert got == {0: 1, 1: 1, 3: 1}


def test_two_sources_fan_in(spark):
    # sources 0 and 10 both reach 5 -> 6; isolated cycle is its own source
    got = _run(spark, [(0, 5), (10, 5), (5, 6), (20, 21), (21, 20)])
    assert got == {0: 1, 10: 1, 5: 2, 6: 2, 20: 1}


def test_exponential_doubling(spark):
    # chain of k diamonds: counts double per diamond (2^k at the end)
    edges = []
    for k in range(6):
        a, b, c, d = 10 * k, 10 * k + 1, 10 * k + 2, 10 * (k + 1)
        edges += [(a, b), (a, c), (b, d), (c, d)]
    got = _run(spark, edges)
    assert got[60] == 64 and got[0] == 1 and got[30] == 8
