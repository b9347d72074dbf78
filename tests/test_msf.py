"""Borůvka MSF tests: Kruskal golden, ties, forests, multi-graph."""

from pyspark.sql import functions as F

from dachshund_spark import LinkGraph
from dachshund_spark.algorithms.msf import boruvka_msf


def _kruskal(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    sel = []
    for w, s, d in sorted((w, min(s, d), max(s, d)) for s, d, w in edges):
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rs] = rd
            sel.append((s, d, w))
    return sorted(sel)


def _run(spark, edges, schema="src long, dst long, wt double"):
    df = spark.createDataFrame(edges, schema)
    msf = boruvka_msf(LinkGraph(df, extra_cols=["wt"]), "wt")
    return sorted((r.src, r.dst, r.wt) for r in msf.collect())


def test_msf_matches_kruskal_two_components(spark):
    edges = [
        (0, 1, 4.0), (0, 7, 8.0), (1, 7, 11.0), (1, 2, 8.0), (2, 8, 2.0),
        (7, 8, 7.0), (7, 6, 1.0), (8, 6, 6.0), (2, 3, 7.0), (2, 5, 4.0),
        (6, 5, 2.0), (3, 5, 14.0), (3, 4, 9.0), (5, 4, 10.0),
        (20, 21, 1.0), (21, 22, 5.0), (20, 22, 3.0),
    ]
    assert _run(spark, edges) == _kruskal(edges)


def test_msf_equal_weights_tie_break_is_deterministic(spark):
    # all weights equal: forest picked purely by (src, dst) order —
    # unique under the struct total order, so Kruskal (same order) agrees
    edges = [(a, b, 1.0) for a in range(6) for b in range(a + 1, 6)]
    got = _run(spark, edges)
    assert got == _kruskal(edges)
    assert len(got) == 5


def test_msf_parallel_edges_collapse_to_min(spark):
    edges = [(1, 2, 9.0), (2, 1, 3.0), (1, 2, 5.0), (2, 3, 1.0)]
    got = _run(spark, edges)
    assert got == [(1, 2, 3.0), (2, 3, 1.0)]


def test_msf_long_path_contraction(spark):
    # a 64-node path exercises deep merge chains (pointer doubling)
    edges = [(i, i + 1, float(100 - i)) for i in range(63)]
    got = _run(spark, edges)
    assert len(got) == 63  # every path edge is a bridge: all in MSF


def test_msf_multi_graph(spark):
    edges = [
        (0, 1, 2, 1.0), (0, 2, 3, 2.0), (0, 1, 3, 9.0),
        (1, 1, 2, 5.0), (1, 2, 3, 1.0),
    ]
    df = spark.createDataFrame(edges, "graph_id long, src long, dst long, wt double")
    msf = boruvka_msf(LinkGraph(df, extra_cols=["wt"]), "wt")
    got = sorted((r.graph_id, r.src, r.dst, r.wt) for r in msf.collect())
    assert got == [
        (0, 1, 2, 1.0), (0, 2, 3, 2.0),
        (1, 1, 2, 5.0), (1, 2, 3, 1.0),
    ]


def test_msf_partition_invariant(spark):
    edges = [(a, b, float((a * 7 + b) % 13 + 1)) for a in range(20) for b in range(a + 1, 20) if (a + b) % 3]
    df = spark.createDataFrame(edges, "src long, dst long, wt double")
    a = boruvka_msf(LinkGraph(df, extra_cols=["wt"]), "wt")
    b = boruvka_msf(LinkGraph(df.repartition(9), extra_cols=["wt"]), "wt")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_msf_dendrogram_cut_equals_single_linkage(spark):
    """Cutting the distance-MSF at threshold t yields exactly the
    single-linkage clusters (connected components of the ≥(1-t)
    similarity graph) — the property that makes the MSF a reusable
    dendrogram: one forest answers every threshold."""
    from dachshund_spark.algorithms.components import connected_components
    from dachshund_spark.derived import load_table
    from dachshund_spark.pipeline.similarity import (
        similarity_pairs,
        single_linkage_clusters,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").where(
        F.col("vec_id") < 64
    )
    # dendrogram: MSF over distance weights on ALL pairs above a loose floor
    pairs = similarity_pairs(emb, min_sim=0.0)
    dist_edges = pairs.select(
        F.col("a").alias("src"),
        F.col("b").alias("dst"),
        (1.0 - F.col("cos_sim")).alias("wt"),
    )
    msf = boruvka_msf(LinkGraph(dist_edges, extra_cols=["wt"]), "wt")
    for t in (0.25, 0.3, 0.35):
        cut = msf.where(F.col("wt") <= 1.0 - t)
        cc = connected_components(
            LinkGraph(cut.select("src", "dst")), renumber=False
        )
        via_msf = {
            r.vec_id: r.cluster
            for r in emb.select(F.col("vec_id").alias("node_id"))
            .join(cc, on="node_id", how="left")
            .select(
                F.col("node_id").alias("vec_id"),
                F.coalesce("component", "node_id").alias("cluster"),
            )
            .collect()
        }
        direct = {
            r.vec_id: r.cluster
            for r in single_linkage_clusters(emb, min_sim=t).collect()
        }
        assert via_msf == direct, f"threshold {t}"
