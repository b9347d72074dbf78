"""Coupled damping sweep == per-damping single runs."""

import pytest

from pyspark.sql import functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.algorithms import pagerank
from dachshund_spark.algorithms.pagerank import pagerank_damping_sweep


pytestmark = pytest.mark.quick


def test_sweep_equals_single_runs(spark):
    edges = [(i, (i * 7 + 3) % 30) for i in range(30)] + [(5, 17), (40, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    g = LinkGraph(df)
    sweep = {
        (r.node_id, r.damping_e2): r.pagerank
        for r in pagerank_damping_sweep(g, iterations=6).collect()
    }
    for d in (0.5, 0.85):
        single = {
            r.node_id: r.pagerank
            for r in pagerank(g, damping=d, fixed_iterations=6)
            .select("node_id", F.round("pagerank", 8).alias("pagerank"))
            .collect()
        }
        for n, v in single.items():
            assert abs(sweep[(n, int(d * 100))] - v) < 2e-8, (d, n)


def test_sweep_sums_to_one(spark):
    edges = [(i, (i + 1) % 10) for i in range(10)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    rows = pagerank_damping_sweep(g, iterations=8).collect()
    by_d = {}
    for r in rows:
        by_d.setdefault(r.damping_e2, 0.0)
        by_d[r.damping_e2] += r.pagerank
    assert set(by_d) == {50, 70, 85, 95}
    assert all(abs(s - 1.0) < 1e-6 for s in by_d.values())
