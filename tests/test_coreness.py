import pytest
from pyspark.sql import functions as F

from dachshund_spark import LinkGraph
from dachshund_spark.algorithms.coreness import coreness, k_core, k_truss
from tests.fixtures import (
    KARATE_CORE_SIZES,
    KARATE_EDGES,
    KTRUSS_GOLDENS,
    SIMPLE_GRAPHS,
    TWO_KARATE_BRIDGE,
)


@pytest.fixture(scope="module")
def karate(spark):
    return LinkGraph.from_edgelist(spark, KARATE_EDGES)


def test_karate_k_cores(spark, karate):
    # /root/reference/tests/karate_club.rs:407-431
    for k, expected_size in KARATE_CORE_SIZES.items():
        kc = k_core(karate, k)
        assert kc.select("core_id").distinct().count() == 1, f"k={k}"
        assert kc.count() == expected_size, f"k={k}"
    assert k_core(karate, 5).count() == 0


def test_double_karate_bridge_two_4cores(spark):
    # :419-423 — two separate 4-cores of size 10
    g = LinkGraph.from_edgelist(spark, TWO_KARATE_BRIDGE)
    kc = k_core(g, 4)
    sizes = [r["count"] for r in kc.groupBy("core_id").count().collect()]
    assert sorted(sizes) == [10, 10]


def test_karate_coreness(spark, karate):
    # :425-431: max-k core sizes 34/33/22/10; coreness(34) == 4
    out = coreness(karate)
    vals = {r.node_id: r.coreness for r in out.collect()}
    assert vals[34] == 4
    import collections

    hist = collections.Counter(vals.values())
    # nodes with coreness >= k must equal the k-core size
    assert sum(v for c, v in hist.items() if c >= 1) == 34
    assert sum(v for c, v in hist.items() if c >= 2) == 33
    assert sum(v for c, v in hist.items() if c >= 3) == 22
    assert sum(v for c, v in hist.items() if c >= 4) == 10


def test_ktruss_goldens(spark):
    # /root/reference/tests/simple_graph.rs:209-254
    for (gidx, k), expected_sets in KTRUSS_GOLDENS.items():
        g = LinkGraph.from_edgelist(spark, SIMPLE_GRAPHS[gidx])
        out = k_truss(g, k)
        trusses = {}
        for r in out.collect():
            trusses.setdefault(r.truss_id, set()).add(r.node_id)
        got = sorted(trusses.values(), key=sorted)
        assert got == sorted(expected_sets, key=sorted), f"graph {gidx} k={k}"


def test_ktruss_counts(spark):
    # /root/reference/tests/simple_graph.rs:222-232 — get_k_trusses().0 is
    # per-truss EDGE sets: graph1 k=3 → 1 truss of 3 edges; graph2 → 1 of
    # 5 edges; graph5 → 1 of 3 edges; graphs 3/4 → 2 trusses
    for gidx, n_edges in {1: 3, 2: 5, 5: 3}.items():
        g = LinkGraph.from_edgelist(spark, SIMPLE_GRAPHS[gidx])
        nodes, edges = k_truss(g, 3, return_edges=True)
        assert nodes.select("truss_id").distinct().count() == 1, f"graph {gidx}"
        assert edges.count() == n_edges, f"graph {gidx}"
    for gidx in (3, 4):
        g = LinkGraph.from_edgelist(spark, SIMPLE_GRAPHS[gidx])
        assert (
            k_truss(g, 3).select("truss_id").distinct().count() == 2
        ), f"graph {gidx}"


def test_multi_graph_kcore(spark):
    # triangle (3-core-free) + K4 in separate graphs
    edges = [(0, a, b) for a, b in [(0, 1), (1, 2), (2, 0)]]
    edges += [(1, a, b) for a in range(4) for b in range(a + 1, 4)]
    g = LinkGraph.from_edgelist(spark, edges)
    kc = k_core(g, 3)
    out = {(r.graph_id, r.node_id) for r in kc.collect()}
    assert out == {(1, 0), (1, 1), (1, 2), (1, 3)}


def test_coreness_hindex_matches_sequential(spark, karate):
    """h-index propagation (one fixpoint) must equal the reference's
    sequential k-peel on the karate golden
    (/root/reference/tests/karate_club.rs:407-431)."""
    from dachshund_spark.algorithms.coreness import coreness_hindex

    seq = {r.node_id: r.coreness for r in coreness(karate).collect()}
    hix = {r.node_id: r.coreness for r in coreness_hindex(karate).collect()}
    assert hix == seq
    assert hix[34] == 4 and max(hix.values()) == 4


def test_coreness_hindex_random_graph(spark):
    """Cross-check on a seeded power-law graph (hub-heavy shape)."""
    from dachshund_spark import LinkGraph
    from dachshund_spark.algorithms.coreness import coreness_hindex

    g = LinkGraph.powerlaw_graph(spark, n_nodes=300, n_edges=900, seed=11)
    seq = {r.node_id: r.coreness for r in coreness(g).collect()}
    hix = {r.node_id: r.coreness for r in coreness_hindex(g).collect()}
    assert hix == seq


def test_coreness_hindex_fixed_iterations_converged(spark, karate):
    """A fixed superstep budget past the convergence depth returns the
    converged values (the oracle-parity contract)."""
    from dachshund_spark.algorithms.coreness import coreness_hindex

    conv = {r.node_id: r.coreness for r in coreness_hindex(karate).collect()}
    fixed = {
        r.node_id: r.coreness
        for r in coreness_hindex(karate, fixed_iterations=16).collect()
    }
    assert fixed == conv


def test_weighted_k_core_strength_peel(spark):
    """Triangle 1-2-3 (w=1,2,3) + pendant 1-4 (w=10): peel at k=5
    cascades 2 (s=4) then 3 (s=2 after losing 2's edges), leaving the
    heavy pendant pair at strength 10 each."""
    from dachshund_spark import LinkGraph
    from dachshund_spark.algorithms.coreness import weighted_k_core

    we = spark.createDataFrame(
        [(1, 2, 1.0), (1, 3, 2.0), (2, 3, 3.0), (1, 4, 10.0)],
        "src long, dst long, wt double",
    )
    g = LinkGraph(we, extra_cols=["wt"])
    out = {r.node_id: r.strength for r in weighted_k_core(g, k=5.0).collect()}
    assert out == {1: 10.0, 4: 10.0}
    # k below every strength keeps the whole graph
    out2 = {r.node_id: r.strength for r in weighted_k_core(g, k=1.0).collect()}
    assert out2 == {1: 13.0, 2: 4.0, 3: 5.0, 4: 10.0}
    # duplicate rows / reverse orientation collapse to one weighted edge
    dup = spark.createDataFrame(
        [(1, 2, 5.0), (2, 1, 5.0), (1, 2, 5.0)], "src long, dst long, wt double"
    )
    out3 = {
        r.node_id: r.strength
        for r in weighted_k_core(LinkGraph(dup, extra_cols=["wt"]), k=0.0).collect()
    }
    assert out3 == {1: 5.0, 2: 5.0}


def test_trussness_matches_ktruss_slices_karate(spark):
    from dachshund_spark.algorithms.coreness import k_truss, trussness

    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    tr = {(r.src, r.dst): r.trussness for r in trussness(g).collect()}
    assert len(tr) == 78  # every canonical edge gets a value
    for k in (3, 4, 5):
        _, edges = k_truss(g, k, return_edges=True)
        kt = {(r.src, r.dst) for r in edges.collect()}
        assert {e for e, t in tr.items() if t >= k} == kt


def test_trussness_triangle_free_is_two(spark):
    from dachshund_spark.algorithms.coreness import trussness

    g = LinkGraph.path_graph(spark, 6)
    assert {r.trussness for r in trussness(g).collect()} == {2}


def test_trussness_complete_graph(spark):
    from dachshund_spark.algorithms.coreness import trussness

    # K5: every edge sits in 3 triangles -> trussness 5 everywhere
    g = LinkGraph.complete_graph(spark, 5)
    rows = trussness(g).collect()
    assert len(rows) == 10 and {r.trussness for r in rows} == {5}
