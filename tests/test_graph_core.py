import pytest
from pyspark.sql import functions as F

from dachshund_spark import LinkGraph
from tests.fixtures import KARATE_DEGREES, KARATE_EDGES


@pytest.fixture(scope="module")
def karate(spark):
    return LinkGraph.from_edgelist(spark, KARATE_EDGES)


def test_counts(karate):
    # /root/reference/tests/karate_club.rs:208-209
    assert karate.num_nodes() == 34
    assert karate.num_edges() == 78


def test_degrees(karate):
    deg = {r.node_id: r.degree for r in karate.degrees().collect()}
    for node, expected in KARATE_DEGREES.items():
        assert deg[node] == expected


def test_dedup_and_symmetry(spark):
    # repeated + reversed edges collapse (BTreeSet semantics,
    # /root/reference/src/dachshund/simple_undirected_graph_builder.rs:84-108)
    g = LinkGraph.from_edgelist(spark, [(1, 2), (2, 1), (1, 2), (2, 3)])
    assert g.num_edges() == 2
    deg = {r.node_id: r.degree for r in g.degrees().collect()}
    assert deg == {1: 1, 2: 2, 3: 1}


def test_multi_graph_isolation(spark):
    g = LinkGraph.from_edgelist(spark, [(0, 1, 2), (0, 2, 3), (1, 1, 2)])
    deg = {(r.graph_id, r.node_id): r.degree for r in g.degrees().collect()}
    assert deg[(0, 2)] == 2
    assert deg[(1, 2)] == 1


def test_generators(spark):
    k4 = LinkGraph.complete_graph(spark, 4)
    assert k4.num_edges() == 6
    path = LinkGraph.path_graph(spark, 5)
    assert path.num_edges() == 4
    cyc = LinkGraph.cycle_graph(spark, 5)
    assert cyc.num_edges() == 5
    er1 = LinkGraph.erdos_renyi(spark, 30, 0.3, seed=7)
    er2 = LinkGraph.erdos_renyi(spark, 30, 0.3, seed=7)
    assert er1.num_edges() == er2.num_edges()  # seeded determinism


def test_powerlaw_has_hubs(spark):
    g = LinkGraph.powerlaw_graph(spark, 1000, 20000, seed=11)
    deg = g.in_degrees().agg(F.max("in_degree"), F.avg("in_degree")).first()
    assert deg[0] > 20 * deg[1]  # hub skew present


def test_approx_degrees_within_rsd(spark):
    """HLL sketch degrees track exact degrees within tolerance and
    never shuffle-distinct the edge list first."""
    from dachshund_spark import LinkGraph

    g = LinkGraph.powerlaw_graph(spark, 2000, 20_000, seed=13)
    exact = {r.node_id: r.degree for r in g.degrees().collect()}
    approx = {r.node_id: r.approx_degree for r in g.approx_degrees(rsd=0.02).collect()}
    assert set(approx) == set(exact)
    for n, d in exact.items():
        assert abs(approx[n] - d) <= max(3, 0.1 * d), (n, approx[n], d)


def test_sample_edges_per_node_deterministic_prefix(spark):
    from dachshund_spark.skew import sample_edges_per_node
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(0, d) for d in range(1, 11)] + [(1, 2), (1, 3)],
        "src long, dst long",
    )
    s3 = sample_edges_per_node(edges, k=3, seed=9)
    got3 = {(r.src, r.dst): r.sample_rank for r in s3.collect()}
    # per-node caps: node 0 capped at 3, node 1 keeps both
    assert sum(1 for (s, _d) in got3 if s == 0) == 3
    assert sum(1 for (s, _d) in got3 if s == 1) == 2
    # deterministic across invocations
    again = {(r.src, r.dst): r.sample_rank
             for r in sample_edges_per_node(edges, k=3, seed=9).collect()}
    assert got3 == again
    # nested-prefix property: k=2 sample == rank<=2 slice of k=3 sample
    got2 = {(r.src, r.dst) for r in
            sample_edges_per_node(edges, k=2, seed=9).collect()}
    assert got2 == {k for k, v in got3.items() if v <= 2}
    # a different seed reorders (overwhelmingly likely with 10 edges)
    other = {(r.src, r.dst) for r in
             sample_edges_per_node(edges, k=3, seed=10).collect()}
    assert other != set(got3) or True  # non-flaky: just exercise the path


def test_sample_edges_per_node_multigraph_cap_per_graph(spark):
    from dachshund_spark.skew import sample_edges_per_node

    edges = [("a", 5, d) for d in range(1, 5)] + [("b", 5, d) for d in range(1, 5)]
    df = spark.createDataFrame(edges, "graph_id string, src long, dst long")
    out = sample_edges_per_node(df, k=3, seed=1).collect()
    per_graph = {}
    for r in out:
        per_graph[r.graph_id] = per_graph.get(r.graph_id, 0) + 1
    # each graph gets its OWN k-cap, not a pooled cross-graph cap
    assert per_graph == {"a": 3, "b": 3}
    assert all(r.sample_rank <= 3 for r in out)


def test_watts_strogatz_small_world(spark):
    from pyspark.sql import functions as F

    from dachshund_spark.graph import LinkGraph

    g = LinkGraph.watts_strogatz(spark, 200, 4, 10, seed=3)
    e = g.edges
    assert e.count() == 400  # n * k/2
    # no self loops; ~10% rewired away from the lattice
    assert e.where(F.col("src") == F.col("dst")).count() == 0
    lattice = e.where(
        (F.col("dst") == (F.col("src") + 1) % 200)
        | (F.col("dst") == (F.col("src") + 2) % 200)
    ).count()
    rewired = 400 - lattice
    assert 10 <= rewired <= 90  # p=10% of 400 (md5-deterministic, loose band)
    # deterministic across invocations
    again = LinkGraph.watts_strogatz(spark, 200, 4, 10, seed=3).edges
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, e.collect()))


def test_attribute_assortativity_extremes(spark):
    from dachshund_spark.algorithms.stats import attribute_assortativity
    from dachshund_spark.graph import LinkGraph

    # perfect homophily: edges only within class -> r = 1
    edges = spark.createDataFrame(
        [(0, 2), (2, 4), (1, 3), (3, 5)], "src long, dst long"
    )
    cls = spark.range(6).select(
        F.col("id").alias("node_id"), (F.col("id") % 2).alias("cls")
    )
    r = attribute_assortativity(LinkGraph(edges), cls).collect()[0]
    assert r["assortativity"] == 1.0
    assert r["same_class"] == r["m_edges"]

    # perfect heterophily on a balanced bipartite 2-cycle -> r = -1
    edges2 = spark.createDataFrame([(0, 1), (2, 3)], "src long, dst long")
    cls2 = spark.createDataFrame(
        [(0, 0), (1, 1), (2, 0), (3, 1)], "node_id long, cls long"
    )
    r2 = attribute_assortativity(LinkGraph(edges2), cls2).collect()[0]
    assert r2["assortativity"] == -1.0


def test_neighbor_degree_curve_star(spark):
    from dachshund_spark.algorithms.stats import neighbor_degree_curve
    from dachshund_spark.graph import LinkGraph

    # star K_{1,4}: center degree 4 with knn=1; leaves degree 1, knn=4
    edges = spark.createDataFrame([(0, i) for i in range(1, 5)], "src long, dst long")
    out = {r["degree"]: r for r in neighbor_degree_curve(LinkGraph(edges)).collect()}
    assert out[4]["n_nodes"] == 1 and out[4]["knn"] == 1.0
    assert out[1]["n_nodes"] == 4 and out[1]["knn"] == 4.0
    assert out[1]["n_nbr"] == 4 and out[1]["sum_nbr_degree"] == 16
