import pytest

from pyspark.sql import functions as F
from dachshund_spark import LinkGraph
from dachshund_spark.algorithms import (
    connected_components,
    is_connected,
    weakly_connected_components,
)
from tests.fixtures import KARATE_EDGES, KARATE_PLUS_EDGE, TWO_KARATE


def comp_sizes(df):
    rows = df.groupBy("component_id").count().collect()
    return {r.component_id: r["count"] for r in rows}


def test_karate_single_component(spark):
    # /root/reference/tests/karate_club.rs:434-445
    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    cc = connected_components(g)
    sizes = comp_sizes(cc)
    assert sizes == {0: 34}
    assert is_connected(g)


def test_karate_plus_edge_two_components(spark):
    # /root/reference/tests/karate_club.rs:327-333: sizes 34 and 2,
    # numbered by smallest member id (component 0 contains node 1)
    g = LinkGraph.from_edgelist(spark, KARATE_PLUS_EDGE)
    cc = connected_components(g)
    assert comp_sizes(cc) == {0: 34, 1: 2}
    labels = {r.node_id: r.component_id for r in cc.collect()}
    assert labels[1] == 0 and labels[35] == 1 and labels[36] == 1
    assert not is_connected(g)


def test_two_karate_clubs(spark):
    g = LinkGraph.from_edgelist(spark, TWO_KARATE)
    assert comp_sizes(connected_components(g)) == {0: 34, 1: 34}


def test_wcc_directed(spark):
    # directed karate is weakly connected
    # /root/reference/tests/karate_club.rs:579-599
    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    cc = weakly_connected_components(g)
    assert cc.select("component").distinct().count() == 1


def test_empty_graph_raises(spark):
    g = LinkGraph.from_edgelist(spark, [(1, 2)]).edges.where("src > 100")
    with pytest.raises(ValueError):
        is_connected(LinkGraph(g))


def test_multi_graph_components(spark):
    edges = [(0, 1, 2), (0, 2, 3), (0, 10, 11), (1, 1, 2)]
    cc = connected_components(LinkGraph.from_edgelist(spark, edges))
    out = {(r.graph_id, r.node_id): r.component_id for r in cc.collect()}
    assert out[(0, 1)] == out[(0, 3)] == 0
    assert out[(0, 10)] == out[(0, 11)] == 1
    assert out[(1, 1)] == 0


def test_component_label_is_min_member(spark):
    g = LinkGraph.from_edgelist(spark, [(5, 9), (9, 7), (20, 30)])
    cc = connected_components(g)
    labels = {r.node_id: r.component for r in cc.collect()}
    assert labels[7] == 5 and labels[9] == 5 and labels[30] == 20


def test_long_path_convergence(spark):
    # path graph needs ~n supersteps: exercises lineage truncation
    n = 40
    g = LinkGraph.path_graph(spark, n)
    cc = connected_components(g, renumber=False)
    assert cc.select("component").distinct().count() == 1
    assert cc.count() == n


def test_full_range_64bit_ids_no_overflow(spark):
    """Node ids spanning the full signed-64-bit range (the shape
    url_to_node_id/xxhash64 produces) must not overflow the convergence
    label sum under ANSI mode."""
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (4, 5)], "src long, dst long"
    )
    # map small ids onto xxhash64's full range (mix of huge +/- values)
    hashed = base.select(
        F.xxhash64(F.col("src").cast("string")).alias("src"),
        F.xxhash64(F.col("dst").cast("string")).alias("dst"),
    )
    cc = connected_components(LinkGraph(hashed), renumber=True)
    sizes = comp_sizes(cc)
    assert sorted(sizes.values()) == [2, 4]


def test_star_cc_matches_hashmin_powerlaw(spark):
    from dachshund_spark.algorithms.components import connected_components_star

    g = LinkGraph.powerlaw_graph(spark, n_nodes=500, n_edges=1500, seed=5)
    hm = {
        r.node_id: r.component
        for r in connected_components(g, renumber=False).collect()
    }
    st, rounds = connected_components_star(g)
    stm = {r.node_id: r.component for r in st.collect()}
    assert stm == hm
    assert rounds <= 10  # log-round contraction, not diameter-bound


def test_star_cc_log_rounds_on_deep_path(spark):
    """A 64-node path needs ~63 hash-min supersteps (1 hop/round) but
    only O(log n) star-contraction rounds — the adversarial case the
    variant exists for."""
    from dachshund_spark.algorithms.components import connected_components_star

    g = LinkGraph.path_graph(spark, 64)
    st, rounds = connected_components_star(g)
    labels = {r.node_id: r.component for r in st.collect()}
    assert labels == {i: 0 for i in range(64)}
    assert rounds <= 10


def test_star_cc_multi_graph_and_two_components(spark):
    from dachshund_spark.algorithms.components import connected_components_star

    edges = [(0, 1, 2), (0, 2, 3), (0, 10, 11), (7, 5, 6)]
    g = LinkGraph.from_edgelist(spark, edges)
    st, _ = connected_components_star(g)
    out = {(r.graph_id, r.node_id): r.component for r in st.collect()}
    assert out[(0, 1)] == out[(0, 2)] == out[(0, 3)] == 1
    assert out[(0, 10)] == out[(0, 11)] == 10
    assert out[(7, 5)] == out[(7, 6)] == 5


def test_renumber_two_phase_no_single_partition_window(spark):
    """renumber=True on a single-graph frame must not funnel all
    distinct labels through one task: the two-phase rank keeps every
    Exchange keyed (no Exchange SinglePartition in the final plan) and
    still reproduces the exact dense 0-based numbering."""
    # 2000 nodes in 1000 two-node components — many components relative
    # to nodes, the shape that killed the global window
    edges = spark.range(1000).select(
        (F.col("id") * 2).alias("src"), (F.col("id") * 2 + 1).alias("dst")
    )
    cc = connected_components(LinkGraph(edges), renumber=True)
    out = {r.node_id: r.component_id for r in cc.collect()}
    assert sorted(set(out.values())) == list(range(1000))
    assert out[0] == 0 and out[1] == 0 and out[1998] == 999
    plan = cc._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "SinglePartition" not in plan


def test_min_long_node_id_survives_ansi(spark):
    """Long.MIN_VALUE as a node id must flow through CC, LPA and BFS
    without ANSI overflow (the -label tie-break negation would throw)."""
    from dachshund_spark.algorithms import label_propagation
    from dachshund_spark.algorithms.paths import bfs_sssp

    lo = -(1 << 63)
    hi = (1 << 63) - 1
    g = LinkGraph.from_edgelist(spark, [(lo, 5), (5, 7), (7, hi)])
    cc = {r.node_id: r.component for r in connected_components(g, renumber=False).collect()}
    assert cc == {lo: lo, 5: lo, 7: lo, hi: lo}
    lp = {r.node_id: r.label for r in label_propagation(g, iterations=4).collect()}
    assert set(lp) == {lo, 5, 7, hi}  # converged without throwing
    bf = {r.node_id: r.dist for r in bfs_sssp(g, source=lo).collect()}
    assert bf == {lo: 0, 5: 1, 7: 2, hi: 3}


def test_cc_warm_start_matches_cold_after_delta(spark):
    from dachshund_spark.algorithms.components import connected_components
    from dachshund_spark.graph import LinkGraph

    # two paths 0-..-9 and 100-..-109
    edges = [(i, i + 1) for i in range(9)] + [(100 + i, 101 + i) for i in range(9)]
    g1 = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    prev = connected_components(g1, renumber=False)
    # delta: a bridge merges the two paths
    g2 = LinkGraph(
        spark.createDataFrame(edges + [(9, 100)], "src long, dst long")
    )
    warm = connected_components(g2, warm_start=prev, renumber=True)
    cold = connected_components(g2, renumber=True)
    assert sorted(map(tuple, warm.collect())) == sorted(map(tuple, cold.collect()))
    assert warm.select("component").distinct().count() == 1


def test_cc_warm_start_already_converged_is_stable(spark):
    from dachshund_spark.algorithms.components import connected_components
    from dachshund_spark.graph import LinkGraph

    # warm labels already at the fixpoint: even max_iterations=1 (one
    # no-op round) must return them unchanged — a cold run could NOT
    # converge in 1 round on this 20-hop path
    edges = [(i, i + 1) for i in range(20)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    prev = connected_components(g, renumber=False)
    warm = connected_components(
        g, warm_start=prev, renumber=False, max_iterations=1
    )
    assert sorted(map(tuple, warm.collect())) == sorted(map(tuple, prev.collect()))


def test_cc_warm_start_survives_node_deletions(spark):
    """A snapshot delta that DELETES nodes — including a component's
    min (its label) and a cut vertex whose removal splits the
    component — must still converge to the cold-run labels.  Without
    the deletion guard the survivors seed the stale label 0: both
    split halves would converge to component 0, an id that no longer
    exists, and would wrongly share one label."""
    from dachshund_spark.algorithms.components import connected_components
    from dachshund_spark.graph import LinkGraph

    # snapshot: path 0-1-2-3-4 (label 0; 2 is a cut vertex) + pair 10-11
    g1 = LinkGraph(
        spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
        )
    )
    prev = connected_components(g1, renumber=False)
    # delta: nodes 0 (the label) and 2 (cut vertex) vanish; node 5 is new
    g2 = LinkGraph(
        spark.createDataFrame([(1, 5), (3, 4), (10, 11)], "src long, dst long")
    )
    warm = connected_components(g2, warm_start=prev, renumber=True)
    cold = connected_components(g2, renumber=True)
    assert sorted(map(tuple, warm.collect())) == sorted(map(tuple, cold.collect()))
    got = {r.node_id: r.component for r in warm.collect()}
    assert got == {1: 1, 5: 1, 3: 3, 4: 3, 10: 10, 11: 10}
