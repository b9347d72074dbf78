"""Round-5 wave-B operators: edge clustering, signed balance,
temporal 3-cycle motifs — value-exact goldens on handcrafted graphs."""

import pytest

from dachshund_spark import LinkGraph
from dachshund_spark.algorithms.temporal import temporal_cycle_count
from dachshund_spark.algorithms.triangles import (
    edge_clustering,
    signed_triangle_balance,
)

pytestmark = pytest.mark.quick


def test_edge_clustering_path_graph(spark):
    # P4 path 0-1-2-3: no triangles; only edge (1,2) has min degree 2,
    # so C3 = (0+1)/(2-1) = 1.0 → score_e9 = 1_000_000_000.
    g = LinkGraph.from_edgelist(spark, [(0, 0, 1), (0, 1, 2), (0, 2, 3)])
    rows = edge_clustering(g).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.src, r.dst, r.support, r.score_e9) == (1, 2, 0, 1_000_000_000)


def test_edge_clustering_k4(spark):
    # K4: every edge in 2 triangles, min degree 3 → (2+1)*1e9 // 2.
    edges = [(0, a, b) for a in range(4) for b in range(a + 1, 4)]
    g = LinkGraph.from_edgelist(spark, edges)
    rows = edge_clustering(g).collect()
    assert len(rows) == 6
    assert {(r.support, r.score_e9) for r in rows} == {(2, 1_500_000_000)}


def test_signed_balance_explicit_signs(spark):
    # Two triangles sharing edge (1,2): {0,1,2} and {1,2,3}.
    # Signs: all + except (2,3) → {0,1,2} balanced, {1,2,3} unbalanced.
    g = LinkGraph.from_edgelist(
        spark, [(0, 0, 1), (0, 0, 2), (0, 1, 2), (0, 1, 3), (0, 2, 3)]
    )
    signs = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 1), (1, 2, 1), (1, 3, 1), (2, 3, -1)],
        "src long, dst long, sign int",
    )
    r = signed_triangle_balance(g, signs=signs).collect()[0]
    assert (r.n_triangles, r.n_balanced, r.n_unbalanced) == (2, 1, 1)
    assert r.frac_balanced == 0.5


def test_signed_balance_md5_partition(spark):
    # Default md5 signs: counts must partition the triangle total and be
    # deterministic across invocations.
    edges = [(0, a, b) for a in range(6) for b in range(a + 1, 6)]
    g = LinkGraph.from_edgelist(spark, edges)
    r1 = signed_triangle_balance(g).collect()[0]
    r2 = signed_triangle_balance(g).collect()[0]
    assert r1.n_triangles == 20  # C(6,3)
    assert r1.n_balanced + r1.n_unbalanced == 20
    assert (r1.n_balanced, r1.n_unbalanced) == (r2.n_balanced, r2.n_unbalanced)


def test_temporal_cycles_window(spark):
    # 0→1(t1) 1→2(t2) 2→0(t3): one increasing cycle, span 2.
    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 2), (2, 0, 3)], "src long, dst long, t long"
    )
    assert temporal_cycle_count(edges, delta=5).collect()[0].n_cycles == 1
    # span 2 > delta 1 → excluded
    assert temporal_cycle_count(edges, delta=1).collect()[0].n_cycles == 0


def test_temporal_cycles_need_increasing_times(spark):
    # Same structural cycle but times go 3,2,1 in every rotation that
    # closes — no time-respecting ordering exists.
    edges = spark.createDataFrame(
        [(0, 1, 3), (1, 2, 2), (2, 0, 1)], "src long, dst long, t long"
    )
    out = temporal_cycle_count(edges, delta=10).collect()[0]
    assert out.n_cycles == 0
    assert out.n_edges == 3


def test_temporal_cycles_first_contact_dedup(spark):
    # Duplicate contacts collapse to the earliest time: the later
    # (0→1, t=9) observation must not create a second cycle.
    edges = spark.createDataFrame(
        [(0, 1, 1), (0, 1, 9), (1, 2, 2), (2, 0, 3)],
        "src long, dst long, t long",
    )
    out = temporal_cycle_count(edges, delta=10).collect()[0]
    assert (out.n_edges, out.n_cycles) == (3, 1)
