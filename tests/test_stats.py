"""Whole-graph structural statistics (assortativity, reciprocity,
log-binned degree distribution)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.algorithms.stats import (
    degree_assortativity,
    degree_distribution,
    reciprocity,
)


def _local_assortativity(edges):
    """Newman r on the undirected double cover, via numpy."""
    und = set()
    for s, d in edges:
        if s != d:
            und.add((min(s, d), max(s, d)))
    deg = {}
    for s, d in und:
        deg[s] = deg.get(s, 0) + 1
        deg[d] = deg.get(d, 0) + 1
    xs, ys = [], []
    for s, d in und:
        xs += [deg[s], deg[d]]
        ys += [deg[d], deg[s]]
    return float(np.corrcoef(xs, ys)[0, 1])


def test_star_graph_is_maximally_disassortative(spark):
    edges = [(0, i) for i in range(1, 8)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    (r,) = degree_assortativity(g).collect()
    assert abs(r.assortativity - (-1.0)) < 1e-12


def test_assortativity_matches_numpy(spark):
    rng = np.random.default_rng(11)
    edges = sorted(
        {(int(a), int(b)) for a, b in rng.integers(0, 40, size=(120, 2)) if a != b}
    )
    expect = _local_assortativity(edges)
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    (r,) = degree_assortativity(g).collect()
    assert abs(r.assortativity - expect) < 1e-9


def test_assortativity_regular_graph_null(spark):
    # cycle: every degree equal -> zero variance -> undefined (null)
    n = 6
    edges = [(i, (i + 1) % n) for i in range(n)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    (r,) = degree_assortativity(g).collect()
    assert r.assortativity is None


def test_reciprocity_counts(spark):
    # 1<->2 reciprocal; 3->4, 5->6 one-way; dup + self-loop ignored
    edges = [(1, 2), (2, 1), (3, 4), (5, 6), (3, 4), (7, 7)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    (r,) = reciprocity(g).collect()
    assert (r.n_edges, r.n_reciprocal) == (4, 2)
    assert abs(r.reciprocity - 0.5) < 1e-12


def test_reciprocity_dag_zero_cycle_one(spark):
    dag = LinkGraph(
        spark.createDataFrame([(0, 1), (1, 2), (0, 2)], "src long, dst long")
    )
    (r,) = reciprocity(dag).collect()
    assert r.n_reciprocal == 0 and r.reciprocity == 0.0
    both = LinkGraph(
        spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    )
    (r2,) = reciprocity(both).collect()
    assert r2.reciprocity == 1.0


def test_degree_distribution_log_bins(spark):
    # hub 0 with 8 leaves (deg 8 -> bin 3); leaves deg 1 -> bin 0
    edges = [(0, i) for i in range(1, 9)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    out = {r.bin: r.n_nodes for r in degree_distribution(g).collect()}
    assert out == {3: 1, 0: 8}
    raw = {
        r.bin: r.n_nodes
        for r in degree_distribution(g, log_binned=False).collect()
    }
    assert raw == {8: 1, 1: 8}


def test_stats_multigraph_grouped(spark):
    rows = [("a", 0, 1), ("a", 1, 0), ("b", 0, 1), ("b", 1, 2)]
    g = LinkGraph(
        spark.createDataFrame(rows, "graph_id string, src long, dst long")
    )
    rec = {r.graph_id: r.reciprocity for r in reciprocity(g).collect()}
    assert rec == {"a": 1.0, "b": 0.0}
    dd = degree_distribution(g)
    got = {(r.graph_id, r.bin): r.n_nodes for r in dd.collect()}
    assert got == {("a", 0): 2, ("b", 0): 2, ("b", 1): 1}


# ---------------------------------------------------------------------------
# modularity
# ---------------------------------------------------------------------------
def test_modularity_two_triangles(spark):
    # two triangles joined by a bridge; communities = triangle
    # membership. m=7, within=6, d_c = 7 per community →
    # Q = 6/7 - 2*49/(4*49) = 6/7 - 1/2
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    labels = spark.createDataFrame(
        [(i, 0 if i <= 3 else 1) for i in range(1, 7)],
        "node_id long, label long",
    )
    from dachshund_spark.algorithms.stats import modularity

    (r,) = modularity(g, labels).collect()
    assert r.within_edges == 6
    assert r.sum_deg_sq == 98
    assert abs(r.modularity - (6.0 / 7.0 - 0.5)) < 1e-12


def test_modularity_single_community_is_zero(spark):
    # everything in one community: Q = m/m - (2m)^2/(4m^2) = 0
    edges = [(1, 2), (2, 3), (1, 3), (3, 4)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    labels = g.nodes().select("node_id", F.lit(0).alias("label"))
    from dachshund_spark.algorithms.stats import modularity

    (r,) = modularity(g, labels).collect()
    assert abs(r.modularity) < 1e-12


def test_modularity_matches_networkx_formula(spark):
    # random graph + random labels vs a direct numpy evaluation of
    # Q = Σ_c [e_c/m - (d_c/2m)^2]
    rng = np.random.default_rng(7)
    edges = set()
    while len(edges) < 60:
        a, b = rng.integers(0, 25, size=2)
        if a != b:
            edges.add((min(int(a), int(b)), max(int(a), int(b))))
    lab = {n: int(rng.integers(0, 4)) for n in range(25)}
    m = len(edges)
    within = sum(1 for a, b in edges if lab[a] == lab[b])
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    dc = {}
    for n, d in deg.items():
        dc[lab[n]] = dc.get(lab[n], 0) + d
    q_expect = within / m - sum(d * d for d in dc.values()) / (4.0 * m * m)
    g = LinkGraph(spark.createDataFrame(sorted(edges), "src long, dst long"))
    labels = spark.createDataFrame(
        [(n, l) for n, l in lab.items() if n in deg],
        "node_id long, label long",
    )
    from dachshund_spark.algorithms.stats import modularity

    (r,) = modularity(g, labels).collect()
    assert abs(r.modularity - q_expect) < 1e-12


def test_hub_removal_robustness_star(spark):
    from dachshund_spark.algorithms.stats import hub_removal_robustness

    # hub-and-spokes + a pendant pair: removing the hub shatters it
    edges = [(0, i) for i in range(1, 8)] + [(100, 101)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    (r,) = hub_removal_robustness(g, k=1).collect()
    assert r.n_nodes == 10
    assert r.largest_cc == 8
    assert r.n_nodes_after == 2  # spokes become isolated (edge-less)
    assert r.largest_cc_after == 2  # the pendant pair survives


def test_modularity_multigraph_zero_within_graph_not_dropped(spark):
    from dachshund_spark.algorithms.stats import modularity

    # graph "a": triangle in one community (within=3); graph "b": a
    # single edge with endpoints in DIFFERENT communities (within=0) —
    # the zero-within graph must still appear with Q = -sum/(4m^2)
    edges = [("a", 1, 2), ("a", 2, 3), ("a", 1, 3), ("b", 1, 2)]
    g = LinkGraph(
        spark.createDataFrame(edges, "graph_id string, src long, dst long")
    )
    labels = spark.createDataFrame(
        [("a", 1, 0), ("a", 2, 0), ("a", 3, 0), ("b", 1, 0), ("b", 2, 1)],
        "graph_id string, node_id long, label long",
    )
    out = {r.graph_id: r for r in modularity(g, labels).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"].within_edges == 3 and abs(out["a"].modularity) < 1e-12
    assert out["b"].within_edges == 0
    # m=1, d_c = 1 per community: Q = 0 - (1+1)/4 = -0.5
    assert abs(out["b"].modularity - (-0.5)) < 1e-12


def test_powerlaw_alpha_recovers_exponent(spark):
    """Degrees drawn as a deterministic discrete power law with
    alpha=2.5: the continuous-MLE estimate lands within ~0.15."""
    import math

    from dachshund_spark.algorithms.stats import powerlaw_alpha
    from dachshund_spark.graph import LinkGraph

    # build a star-forest whose degree sequence follows d ~ x^(-1/(a-1))
    # (inverse-CDF over a deterministic unit grid, dmin=5)
    alpha, dmin, n = 2.5, 5, 2000
    rows = []
    nid = 0
    for i in range(n):
        u = (i + 0.5) / n
        d = int(dmin * u ** (-1.0 / (alpha - 1.0)))
        hub = nid
        nid += 1
        for _ in range(d):
            rows.append((hub, nid))
            nid += 1
    g = LinkGraph(spark.createDataFrame(rows, "src long, dst long"))
    out = powerlaw_alpha(g, dmin=dmin).collect()
    assert len(out) == 1
    est = out[0].alpha
    assert abs(est - alpha) < 0.15
    # the leaves (degree 1) are excluded from the tail
    assert out[0].n_tail == n
    assert out[0].dmin == dmin


def test_powerlaw_alpha_validation_and_grouped(spark):
    from dachshund_spark.algorithms.stats import powerlaw_alpha
    from dachshund_spark.graph import LinkGraph

    g = LinkGraph(spark.createDataFrame([(1, 2)], "src long, dst long"))
    with pytest.raises(ValueError):
        powerlaw_alpha(g, dmin=1)
    # grouped frames produce one row per graph
    rows = [(0, h, 100 + h * 10 + i) for h in range(3) for i in range(6)]
    rows += [(1, h, 200 + h * 10 + i) for h in range(2) for i in range(7)]
    gg = LinkGraph(
        spark.createDataFrame(rows, "graph_id long, src long, dst long")
    )
    out = {r.graph_id: r for r in powerlaw_alpha(gg, dmin=5).collect()}
    assert out[0].n_tail == 3 and out[1].n_tail == 2


def test_conductance_two_triangles_bridge(spark):
    from dachshund_spark.algorithms.stats import conductance
    from dachshund_spark.graph import LinkGraph

    # two triangles joined by one bridge edge (3-4): communities
    # {1,2,3} and {4,5,6}; 2m = 14; vol = 7 each; cut = 1 each side
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    g = LinkGraph.from_edgelist(spark, edges)
    labels = spark.createDataFrame(
        [(n, 0 if n <= 3 else 1) for n in range(1, 7)],
        "node_id long, label long",
    )
    out = {r.label: r for r in conductance(g, labels).collect()}
    for lab in (0, 1):
        assert out[lab].volume == 7
        assert out[lab].cut_edges == 1
        assert out[lab].conductance == 1 / 7


def test_conductance_whole_graph_null(spark):
    from dachshund_spark.algorithms.stats import conductance
    from dachshund_spark.graph import LinkGraph

    g = LinkGraph.from_edgelist(spark, [(1, 2), (2, 3)])
    labels = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9)], "node_id long, label long"
    )
    r = conductance(g, labels).collect()[0]
    assert r.cut_edges == 0 and r.conductance is None


def test_dyad_census_man_counts(spark):
    from dachshund_spark.algorithms.stats import dyad_census

    # nodes {1..6}: 1<->2 mutual; 3->4, 5->6 asymmetric; dup + loop ignored
    edges = [(1, 2), (2, 1), (3, 4), (5, 6), (3, 4), (7, 7)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    (r,) = dyad_census(g).collect()
    # node 7 counts (self-loop endpoint) -> n = 7, C(7,2) = 21 dyads
    assert (r.n_nodes, r.mutual, r.asymmetric, r.null_dyads) == (7, 1, 2, 18)


def test_dyad_census_grouped_and_total(spark):
    from dachshund_spark.algorithms.stats import dyad_census

    rows = [(0, 1, 2), (0, 2, 1), (0, 1, 3), (1, 1, 2), (1, 3, 4), (1, 4, 3)]
    g = LinkGraph(
        spark.createDataFrame(rows, "graph_id long, src long, dst long")
    )
    out = {r.graph_id: r for r in dyad_census(g).collect()}
    r0, r1 = out[0], out[1]
    assert (r0.n_nodes, r0.mutual, r0.asymmetric, r0.null_dyads) == (3, 1, 1, 1)
    assert (r1.n_nodes, r1.mutual, r1.asymmetric, r1.null_dyads) == (4, 1, 1, 4)
    # M + A + N always == C(n, 2)
    for r in (r0, r1):
        n = r.n_nodes
        assert r.mutual + r.asymmetric + r.null_dyads == n * (n - 1) // 2


def test_degree_gini_star_and_cycle(spark):
    from dachshund_spark.algorithms.stats import degree_gini

    # star K1,4: degrees [4,1,1,1,1] -> G = (2*30 - 6*8) / (5*8) = 0.3
    star = LinkGraph(
        spark.createDataFrame([(0, i) for i in range(1, 5)], "src long, dst long")
    )
    (r,) = degree_gini(star).collect()
    assert (r.n_nodes, r.sum_degree, r.gini_num) == (5, 8, 12)
    assert abs(r.gini - 0.3) < 1e-15
    # cycle: regular -> perfect equality
    cyc = LinkGraph(
        spark.createDataFrame(
            [(i, (i + 1) % 6) for i in range(6)], "src long, dst long"
        )
    )
    (r2,) = degree_gini(cyc).collect()
    assert r2.gini_num == 0 and r2.gini == 0.0


def test_degree_gini_grouped(spark):
    from dachshund_spark.algorithms.stats import degree_gini

    rows = [(0, 0, i) for i in range(1, 5)] + [
        (1, i, (i + 1) % 4) for i in range(4)
    ]
    g = LinkGraph(spark.createDataFrame(rows, "graph_id long, src long, dst long"))
    out = {r.graph_id: r for r in degree_gini(g).collect()}
    assert abs(out[0].gini - 0.3) < 1e-15
    assert out[1].gini == 0.0


def test_burt_constraint_triangle_and_star(spark):
    from dachshund_spark.algorithms.stats import burt_constraint

    # K3: every node C = 2 * (1/2 + 1/4)^2 = 1.125 exactly in e16 units
    k3 = LinkGraph(
        spark.createDataFrame([(0, 1), (1, 2), (0, 2)], "src long, dst long")
    )
    for r in burt_constraint(k3).collect():
        assert int(r.constraint_e16) == 11_250_000_000_000_000
        assert abs(r.c_burt if hasattr(r, "c_burt") else r.constraint - 1.125) < 1e-12

    # star K1,4: hub C = 4 * (1/4)^2 = 0.25; leaves C = 1.0 (single tie)
    star = LinkGraph(
        spark.createDataFrame([(0, i) for i in range(1, 5)], "src long, dst long")
    )
    got = {r.node_id: r.constraint for r in burt_constraint(star).collect()}
    assert abs(got[0] - 0.25) < 1e-12
    for leaf in range(1, 5):
        assert abs(got[leaf] - 1.0) < 1e-12


def test_closeness_formula_on_path(spark):
    """P4 path 0-1-2-3 closeness via the driver query's exact-integer
    Wasserman-Faust form: C(end) = (3/3)*(3/6) = 0.5, C(mid) = 3/4."""
    from dachshund_spark.algorithms.neighborhood import landmark_distances
    from dachshund_spark.graph import LinkGraph

    g = LinkGraph(
        spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    )
    d = landmark_distances(g, [0, 1, 2, 3], max_distance=8)
    agg = (
        d.groupBy(F.col("landmark").alias("node_id"))
        .agg(
            F.count("dist").cast("long").alias("r"),
            F.sum("dist").cast("long").alias("s"),
        )
        .collect()
    )
    n = 4
    got = {
        row.node_id: (row.r - 1) * (row.r - 1) / ((n - 1) * row.s)
        for row in agg
    }
    assert abs(got[0] - 0.5) < 1e-15 and abs(got[3] - 0.5) < 1e-15
    assert abs(got[1] - 0.75) < 1e-15 and abs(got[2] - 0.75) < 1e-15


def test_clustering_by_degree_k4_plus_pendant(spark):
    """K4 with a pendant: degree-3 nodes have C=1, the degree-4 node
    C = 2*3/(4*3) = 0.5, pendant (deg 1) excluded."""
    from dachshund_spark.algorithms.triangles import clustering_by_degree
    from dachshund_spark.graph import LinkGraph

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    g = LinkGraph(
        spark.createDataFrame(k4 + [(0, 9)], "src long, dst long")
    )
    out = {r.degree: r for r in clustering_by_degree(g).collect()}
    assert set(out) == {3, 4}
    assert out[3].n_nodes == 3 and abs(out[3].mean_clustering - 1.0) < 1e-15
    assert out[4].n_nodes == 1 and abs(out[4].mean_clustering - 0.5) < 1e-15


def test_efficiency_terms_on_path(spark):
    """P3 0-1-2: ordered pairs at dist 1 x4, dist 2 x2; Wiener = 4,
    efficiency = (4 + 2*0.5)/6 = 5/6."""
    from dachshund_spark.algorithms.neighborhood import landmark_distances
    from dachshund_spark.graph import LinkGraph

    g = LinkGraph(spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long"))
    d = landmark_distances(g, [0, 1, 2], max_distance=8).where(F.col("dist") > 0)
    rows = d.collect()
    dists = sorted(r.dist for r in rows)
    assert dists == [1, 1, 1, 1, 2, 2]
    inv_e8 = sum(round(1e8 / r.dist) for r in rows)
    assert inv_e8 == 4 * 100000000 + 2 * 50000000
    assert abs(inv_e8 / 6 / 1e8 - 5 / 6) < 1e-12
