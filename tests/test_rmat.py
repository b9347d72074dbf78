"""Deterministic R-MAT generator properties."""

from pyspark.sql import functions as F

from dachshund_spark.graph import LinkGraph


def test_rmat_deterministic_and_bounded(spark):
    a = LinkGraph.rmat(spark, scale=6, n_edges=512, seed=9).edges
    b = LinkGraph.rmat(spark, scale=6, n_edges=512, seed=9).edges
    ra = sorted((r["src"], r["dst"]) for r in a.collect())
    rb = sorted((r["src"], r["dst"]) for r in b.collect())
    assert ra == rb and len(ra) == 512
    assert all(0 <= s < 64 and 0 <= d < 64 for s, d in ra)
    # different seed, different graph
    rc = sorted(
        (r["src"], r["dst"])
        for r in LinkGraph.rmat(spark, scale=6, n_edges=512, seed=10).edges.collect()
    )
    assert rc != ra


def test_rmat_is_skewed_toward_low_quadrant(spark):
    # a=57% pulls mass toward low node ids: node 0's out-degree should
    # dominate the median node's
    e = LinkGraph.rmat(spark, scale=7, n_edges=4096, seed=42).edges
    deg = {
        r["src"]: r["n"]
        for r in e.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    top = max(deg.values())
    import statistics

    assert top >= 8 * statistics.median(deg.values())
    assert max(deg, key=deg.get) < 16  # the hub lives in the low-id corner
