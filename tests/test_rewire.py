"""Degree-preserving rewiring (configuration-model null graphs).

The swap semantics are our own synchronized, deterministic variant of
Maslov-Sneppen double-edge swaps (the reference has no null-model
generator; motif counting it feeds is reference parity —
/root/reference/src/dachshund/algorithms/shortest_paths.rs has the
reference's closest analog of graph transforms). These tests pin the
invariants that make the operator a valid null model.
"""

import pytest
from pyspark.sql import functions as F

from dachshund_spark.algorithms.rewire import degree_preserving_swaps
from dachshund_spark.graph import LinkGraph
from tests.fixtures import KARATE_EDGES


def _degrees(edges_df):
    und = edges_df.select("src", "dst").unionAll(
        edges_df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return {
        r["node_id"]: r["degree"]
        for r in und.groupBy(F.col("src").alias("node_id"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .collect()
    }


@pytest.fixture(scope="module")
def karate(spark):
    return LinkGraph(spark.createDataFrame(KARATE_EDGES, ["src", "dst"]))


def test_rewire_preserves_degrees_and_edge_count(spark, karate):
    out = degree_preserving_swaps(karate, rounds=4, num_buckets=8, seed=42)
    rows = out.collect()
    assert len(rows) == 78  # edge count invariant
    # canonical, no duplicates
    assert all(r["src"] < r["dst"] for r in rows)
    assert len({(r["src"], r["dst"]) for r in rows}) == 78
    # every node keeps its exact degree
    assert _degrees(out) == _degrees(karate.canonical_edges())


def test_rewire_actually_swaps_and_is_deterministic(spark, karate):
    a = degree_preserving_swaps(karate, rounds=4, num_buckets=8, seed=42)
    b = degree_preserving_swaps(karate, rounds=4, num_buckets=8, seed=42)
    sa = {(r["src"], r["dst"]) for r in a.collect()}
    sb = {(r["src"], r["dst"]) for r in b.collect()}
    assert sa == sb  # deterministic replay
    orig = {(r["src"], r["dst"]) for r in karate.canonical_edges().collect()}
    assert sa != orig  # the null model moved
    # a different seed explores a different state
    sc = {
        (r["src"], r["dst"])
        for r in degree_preserving_swaps(
            karate, rounds=4, num_buckets=8, seed=7
        ).collect()
    }
    assert sc != sa


def test_rewire_multi_graph_independent(spark, karate):
    g1 = [(0, u, v) for u, v in KARATE_EDGES]
    g2 = [(1, u, v) for u, v in KARATE_EDGES]
    both = LinkGraph(
        spark.createDataFrame(g1 + g2, ["graph_id", "src", "dst"])
    )
    out = degree_preserving_swaps(both, rounds=3, num_buckets=8, seed=42)
    per = {
        r["graph_id"]: r["n"]
        for r in out.groupBy("graph_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per == {0: 78, 1: 78}
    # identical graphs under the same seed rewire identically
    s0 = {
        (r["src"], r["dst"])
        for r in out.where(F.col("graph_id") == 0).select("src", "dst").collect()
    }
    s1 = {
        (r["src"], r["dst"])
        for r in out.where(F.col("graph_id") == 1).select("src", "dst").collect()
    }
    assert s0 == s1
    single = {
        (r["src"], r["dst"])
        for r in degree_preserving_swaps(
            karate, rounds=3, num_buckets=8, seed=42
        ).collect()
    }
    assert s0 == single
    # per-graph degree sequences preserved
    for gid, edges in ((0, g1), (1, g2)):
        sub = out.where(F.col("graph_id") == gid).select("src", "dst")
        ref = spark.createDataFrame(
            [(u, v) for _, u, v in edges], ["src", "dst"]
        )
        assert _degrees(sub) == _degrees(ref)


def test_motif_significance_observed_matches_triangles(spark, karate):
    from dachshund_spark.algorithms.rewire import motif_significance
    from dachshund_spark.algorithms.triangles import triangle_list

    row = motif_significance(karate, rounds=2, num_buckets=8, seed=42).first()
    assert row["observed_triangles"] == triangle_list(karate).count() == 45
    assert row["null_triangles"] >= 0
    if row["null_triangles"] > 0:
        assert row["excess_ratio"] == pytest.approx(
            45 / row["null_triangles"]
        )
    else:
        assert row["excess_ratio"] is None
