import pytest
from pyspark.sql import functions as F

from dachshund_spark import LinkGraph
from dachshund_spark.algorithms import pagerank
from tests.fixtures import KARATE_EDGES, KARATE_EVCENT


def _pagerank_dict(df):
    return {r.node_id: r.pagerank for r in df.collect()}


def test_sums_to_one(spark):
    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    pr = pagerank(g, tol=1e-9)
    total = pr.agg(F.sum("pagerank")).first()[0]
    assert abs(total - 1.0) < 1e-9


def test_matches_networkx_reference_values(spark):
    # Golden values computed once with an independent dense numpy
    # implementation of the standard formulation (alpha=0.85, L1 tol
    # 1e-14) on the undirected karate club and frozen here
    # (FIXTURES.md: golden_pagerank has no Dachshund fixture).
    golden = {
        34: 0.10091918233262318,
        1: 0.09699728538829755,
        33: 0.07169322600575244,
        3: 0.05707850948846196,
        12: 0.009564745492135712,
    }
    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    pr = _pagerank_dict(pagerank(g, undirected=True, tol=1e-12, max_iterations=200))
    for node, expected in golden.items():
        assert abs(pr[node] - expected) <= 1e-6


def test_evcent_parity_with_reference(spark):
    # PageRank with damping=1 on the undirected graph is power iteration
    # with row-normalized A; the stationary vector is degree-proportional
    # only for undirected, but per SURVEY.md §2.11 we validate the
    # *eigenvector centrality* fixture via the dedicated evcent in the
    # local pack. Here we sanity-check damping=1: ranks stay a valid
    # distribution and the top node matches the evcent fixture's top node
    # (node 34, /root/reference/tests/karate_club.rs:394-404).
    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    pr = pagerank(g, undirected=True, damping=1.0, fixed_iterations=50)
    rows = pr.orderBy(F.desc("pagerank")).limit(1).collect()
    assert rows[0].node_id == 34
    assert abs(pr.agg(F.sum("pagerank")).first()[0] - 1.0) < 1e-9


def test_dangling_mass_conserved(spark):
    # node 3 is a sink (dangling); mass must still sum to 1
    g = LinkGraph.from_edgelist(spark, [(1, 2), (2, 3), (1, 3)])
    pr = pagerank(g, tol=1e-10)
    assert abs(pr.agg(F.sum("pagerank")).first()[0] - 1.0) < 1e-9


def test_salted_equals_plain(spark):
    g = LinkGraph.powerlaw_graph(spark, 500, 5000, seed=3)
    plain = _pagerank_dict(pagerank(g, fixed_iterations=10))
    salted = _pagerank_dict(pagerank(g, fixed_iterations=10, num_salts=8))
    assert set(plain) == set(salted)
    for k in plain:
        assert abs(plain[k] - salted[k]) <= 1e-12


def test_multi_graph_pagerank(spark):
    edges = [(0, 1, 2), (0, 2, 1), (5, 1, 2), (5, 2, 3), (5, 3, 1)]
    pr = pagerank(LinkGraph.from_edgelist(spark, edges), tol=1e-10)
    sums = {
        r.graph_id: r.total
        for r in pr.groupBy("graph_id").agg(F.sum("pagerank").alias("total")).collect()
    }
    assert abs(sums[0] - 1.0) < 1e-8 and abs(sums[5] - 1.0) < 1e-8


def test_checkpoint_resume(spark, tmp_path):
    from dachshund_spark.checkpoint import CheckpointManager

    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    full = _pagerank_dict(pagerank(g, undirected=True, fixed_iterations=12))

    # run 1: stop after 6 supersteps (simulated kill via max budget)
    mgr = CheckpointManager(spark, str(tmp_path / "ckpt"))
    pagerank(g, undirected=True, fixed_iterations=6, manager=mgr)
    hist = mgr.history()
    assert hist and all("superstep" in h and "lineage" in h for h in hist)

    # run 2: resumes from the last committed snapshot and finishes
    resumed = _pagerank_dict(
        pagerank(g, undirected=True, fixed_iterations=12, manager=mgr, resume=True)
    )
    for k in full:
        assert abs(full[k] - resumed[k]) <= 1e-12


def test_hub_aware_salting_equals_plain(spark):
    """Degree-aware routing (salt only hub destinations) must not
    change the result."""
    g = LinkGraph.powerlaw_graph(spark, 500, 5000, seed=3)
    plain = _pagerank_dict(pagerank(g, fixed_iterations=5))
    hub = _pagerank_dict(
        pagerank(g, fixed_iterations=5, num_salts=8, hub_threshold=20)
    )
    assert set(plain) == set(hub)
    for k in plain:
        assert abs(plain[k] - hub[k]) <= 1e-12


def test_hub_aware_salted_sum_equivalence_10m(spark):
    """Hub-aware salted_sum == plain groupBy-sum on a 10^7-edge
    power-law frame (integer values, so equality is exact)."""
    from dachshund_spark.skew import salted_sum, top_degree_hubs

    g = LinkGraph.powerlaw_graph(spark, 100_000, 10_000_000, seed=5)
    e = g.edges
    deg = e.groupBy(F.col("dst").alias("node_id")).agg(
        F.count("*").alias("degree")
    )
    hubs = top_degree_hubs(deg, 50_000).withColumnRenamed("node_id", "dst")
    assert hubs.count() > 0, "fixture must actually contain hubs"
    flagged = e.join(
        F.broadcast(hubs.withColumn("_h", F.lit(True))), "dst", "left"
    ).withColumn("_h", F.coalesce("_h", F.lit(False))).withColumn(
        "v", F.lit(1).cast("long")
    )
    expect = {
        r.dst: r.s
        for r in flagged.groupBy("dst").agg(F.sum("v").alias("s"))
        .where(F.col("s") >= 40_000).collect()
    }
    got = {
        r.dst: r.s
        for r in salted_sum(flagged, ["dst"], "v", "s", 16, hub_flag="_h")
        .where(F.col("s") >= 40_000).collect()
    }
    assert got == expect


def test_weighted_pagerank(spark):
    """weight_col generalizes out-degree to the outgoing weight sum;
    uniform weights must reproduce the unweighted ranks exactly, and
    non-uniform weights must shift mass toward heavy edges."""
    from pyspark.sql import functions as F

    from dachshund_spark import LinkGraph

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 1)], "src long, dst long"
    )
    uniform = edges.withColumn("wt", F.lit(2.0))
    plain = _pagerank_dict(pagerank(LinkGraph(edges), fixed_iterations=8))
    weighted_uniform = _pagerank_dict(
        pagerank(
            LinkGraph(uniform, extra_cols=["wt"]),
            fixed_iterations=8,
            dedupe_edges=False,
            weight_col="wt",
        )
    )
    for n in plain:
        assert abs(plain[n] - weighted_uniform[n]) <= 1e-12

    skewed = edges.withColumn(
        "wt", F.when((F.col("src") == 1) & (F.col("dst") == 2), 9.0).otherwise(1.0)
    )
    ws = _pagerank_dict(
        pagerank(
            LinkGraph(skewed, extra_cols=["wt"]),
            fixed_iterations=8,
            dedupe_edges=False,
            weight_col="wt",
        )
    )
    assert ws[2] > plain[2]  # node 2 gains from its heavy in-edge
    assert abs(sum(ws.values()) - 1.0) < 1e-9


def test_personalized_pagerank(spark):
    """Teleport mass restricted to seeds: seed-adjacent nodes outrank
    the global solution's ordering, total mass stays 1, and zero mass
    reaches components disconnected from the seeds."""
    edges = [(0, 1, 2), (0, 2, 3), (0, 3, 1), (0, 8, 9), (0, 9, 8)]
    g = LinkGraph.from_edgelist(spark, edges)
    ppr = _pagerank_dict(
        pagerank(g, fixed_iterations=20, personalization=[1])
    )
    assert abs(sum(ppr.values()) - 1.0) < 1e-9
    # 8 and 9 are unreachable from seed 1: no teleport, no flow
    assert ppr[8] == 0.0 and ppr[9] == 0.0
    assert ppr[1] > ppr[3] > 0


def test_pagerank_argument_validation(spark):
    import pytest

    g = LinkGraph.from_edgelist(spark, [(1, 2), (2, 3)])
    with pytest.raises(ValueError, match="num_salts"):
        pagerank(g, fixed_iterations=1, hub_threshold=5)
    with pytest.raises(ValueError, match="not\\b.*nodes|teleport"):
        pagerank(g, fixed_iterations=1, personalization=[999])
    # duplicate seeds are deduped, mass still sums to 1
    pr = _pagerank_dict(pagerank(g, fixed_iterations=10, personalization=[1, 1]))
    assert abs(sum(pr.values()) - 1.0) < 1e-9


def test_personalized_multigraph_per_graph_normalization(spark):
    """Seeds present in different subsets of graphs: p must sum to 1
    PER GRAPH, normalized by the seeds actually present in that graph
    (a global count would double-count shared seeds and pass
    complementary absences while rank mass silently decays)."""
    # graph 0 contains seeds 1 and 2; graph 5 contains only seed 1
    edges = [(0, 1, 3), (0, 2, 4), (5, 1, 7), (5, 7, 1)]
    g = LinkGraph.from_edgelist(spark, edges)
    pr = pagerank(g, fixed_iterations=15, personalization=[1, 2])
    sums = {
        r.graph_id: r.total
        for r in pr.groupBy("graph_id")
        .agg(F.sum("pagerank").alias("total"))
        .collect()
    }
    assert abs(sums[0] - 1.0) < 1e-9
    assert abs(sums[5] - 1.0) < 1e-9


def test_personalized_multigraph_missing_everywhere_raises(spark):
    import pytest

    # graph 5 contains neither seed: its teleport vector would be zero
    edges = [(0, 1, 2), (5, 8, 9)]
    g = LinkGraph.from_edgelist(spark, edges)
    with pytest.raises(ValueError, match="contain none"):
        pagerank(g, fixed_iterations=1, personalization=[1, 2])


def test_warmstart_from_converged_is_fixpoint(spark):
    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    converged = pagerank(g, tol=1e-12)
    warm = pagerank(g, fixed_iterations=2, init_ranks=converged)
    a, b = _pagerank_dict(converged), _pagerank_dict(warm)
    assert max(abs(a[k] - b[k]) for k in a) < 1e-9


def test_warmstart_beats_cold_start_on_churned_graph(spark):
    g_old = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    # churn: drop one edge, add one
    churned = [e for e in KARATE_EDGES if e != (0, 1)] + [(33, 5)]
    g_new = LinkGraph.from_edgelist(spark, churned)
    truth = _pagerank_dict(pagerank(g_new, tol=1e-12))
    prior = pagerank(g_old, tol=1e-12)
    warm = _pagerank_dict(pagerank(g_new, fixed_iterations=2, init_ranks=prior))
    cold = _pagerank_dict(pagerank(g_new, fixed_iterations=2))
    l1_warm = sum(abs(warm[k] - truth[k]) for k in truth)
    l1_cold = sum(abs(cold[k] - truth[k]) for k in truth)
    assert l1_warm < l1_cold


def test_warmstart_new_nodes_and_renormalization(spark):
    g_old = LinkGraph.from_edgelist(spark, [(1, 2), (2, 3)])
    prior = pagerank(g_old, fixed_iterations=5)
    # new snapshot adds node 9 (absent from the prior)
    g_new = LinkGraph.from_edgelist(spark, [(1, 2), (2, 3), (3, 9)])
    warm = pagerank(g_new, fixed_iterations=0, init_ranks=prior)
    d = _pagerank_dict(warm)
    assert 9 in d
    assert abs(sum(d.values()) - 1.0) < 1e-9


def test_warmstart_with_personalization_raises(spark):
    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    prior = pagerank(g, fixed_iterations=1)
    with pytest.raises(ValueError, match="warm"):
        pagerank(g, fixed_iterations=1, init_ranks=prior, personalization=[1])
