import pytest

from dachshund_spark import LinkGraph
from dachshund_spark.algorithms.paths import all_distances, bfs_sssp
from tests.fixtures import KARATE_EDGES, KARATE_PLUS_EDGE


@pytest.fixture(scope="module")
def karate(spark):
    return LinkGraph.from_edgelist(spark, KARATE_EDGES)


def test_karate_sssp_golden(spark, karate):
    # /root/reference/tests/karate_club.rs:248-294 (source = node 1)
    out = {r.node_id: r for r in bfs_sssp(karate, 1).collect()}
    assert out[1].dist == 0 and list(out[1].parents) == [1]
    assert out[2].dist == 1 and 1 in out[2].parents
    assert out[33].dist == 2
    assert out[30].dist == 3
    assert list(out[10].parents) == [3]
    assert sorted(out[33].parents) == [3, 9, 32]
    assert sorted(out[30].parents) == [33, 34]


def test_sigma_counts(spark, karate):
    # shortest-path multiplicities: node 2 has 1 path; node 16 has 7
    # (/root/reference/tests/karate_club.rs:283-294: 7 enumerated paths to 16)
    out = {r.node_id: r.sigma for r in bfs_sssp(karate, 1).collect()}
    assert out[2] == 1
    assert out[16] == 7
    # 7 shortest paths to 30: {1-3-33, 1-9-33, 1-32-33} + {1-9-34,
    # 1-14-34, 1-20-34, 1-32-34} then -30
    assert out[30] == 7


def test_unreachable_nodes_null(spark):
    g = LinkGraph.from_edgelist(spark, KARATE_PLUS_EDGE)
    dists = {r.node_id: r.dist for r in all_distances(g, 1).collect()}
    assert dists[35] is None and dists[36] is None
    assert dists[34] == 2 and dists[2] == 1


def test_path_graph_depths(spark):
    g = LinkGraph.path_graph(spark, 12)
    out = {r.node_id: r.dist for r in bfs_sssp(g, 0).collect()}
    assert out[11] == 11 and out[5] == 5


def test_multi_graph_bfs(spark):
    edges = [(0, 1, 2), (0, 2, 3), (1, 1, 5)]
    g = LinkGraph.from_edgelist(spark, edges)
    out = {(r.graph_id, r.node_id): r.dist for r in bfs_sssp(g, 1).collect()}
    assert out[(0, 3)] == 2
    assert out[(1, 5)] == 1
    assert (1, 3) not in out


def test_weighted_sssp_hand_graph(spark):
    from pyspark.sql import functions as F

    from dachshund_spark.algorithms.paths import weighted_sssp

    # 1->2 (1), 2->3 (1), 1->3 (5): shortest 1..3 = 2 via 2
    e = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (1, 3, 5.0), (4, 5, 2.0)],
        "src long, dst long, wt double",
    )
    g = LinkGraph(e, extra_cols=["wt"])
    d = {r.node_id: r.dist for r in weighted_sssp(g, 1, "wt").collect()}
    assert d[1] == 0.0 and d[2] == 1.0 and d[3] == 2.0
    assert d[4] is None and d[5] is None  # unreachable from 1


def test_weighted_sssp_unit_weights_match_bfs(spark, karate):
    from pyspark.sql import functions as F

    from dachshund_spark.algorithms.paths import weighted_sssp

    und = karate.undirected_edges().withColumn("wt", F.lit(1.0))
    g = LinkGraph(und, extra_cols=["wt"])
    wd = {r.node_id: r.dist for r in weighted_sssp(g, 1, "wt").collect()}
    bd = {r.node_id: r.dist for r in bfs_sssp(karate, 1).collect()}
    for n, d in bd.items():
        assert wd[n] == float(d)


def test_weighted_sssp_fixed_rounds_prefix(spark):
    from dachshund_spark.algorithms.paths import weighted_sssp

    # path 0-1-2-3 (weight 1 each): after 2 fixed rounds only <=2-hop
    # distances are settled
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)], "src long, dst long, wt double"
    )
    g = LinkGraph(e, extra_cols=["wt"])
    d2 = {r.node_id: r.dist for r in weighted_sssp(g, 0, "wt", fixed_rounds=2).collect()}
    assert d2[2] == 2.0 and d2[3] is None
    d3 = {r.node_id: r.dist for r in weighted_sssp(g, 0, "wt", fixed_rounds=3).collect()}
    assert d3[3] == 3.0


def test_widest_path_bottleneck(spark):
    from dachshund_spark.algorithms.paths import widest_path
    from dachshund_spark.graph import LinkGraph
    from pyspark.sql import functions as F

    # 0-1 cap 10, 1-2 cap 3 vs direct 0-2 cap 5: widest to 2 is 5;
    # 2-3 cap 4: widest to 3 = min(5,4) = 4 (via the direct route)
    rows = [(0, 1, 10), (1, 2, 3), (0, 2, 5), (2, 3, 4)]
    e = spark.createDataFrame(rows, "src long, dst long, wt long")
    sym = e.union(e.select(F.col("dst"), F.col("src"), F.col("wt")))
    out = {r["node_id"]: r["capacity"] for r in
           widest_path(LinkGraph(sym, extra_cols=["wt"]), 0, "wt",
                       fixed_rounds=6).collect()}
    assert out == {0: None, 1: 10, 2: 5, 3: 4}
    # convergence path (no fixed_rounds) agrees
    conv = {r["node_id"]: r["capacity"] for r in
            widest_path(LinkGraph(sym, extra_cols=["wt"]), 0, "wt").collect()}
    assert conv == out
