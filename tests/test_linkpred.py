"""Link-prediction scores (common neighbors / Jaccard / Adamic-Adar /
preferential attachment) — hand-computed goldens on tiny graphs plus
the hub-cap semantics."""

import math

from pyspark.sql import functions as F

from dachshund_spark.algorithms.linkpred import link_prediction_scores
from dachshund_spark.graph import LinkGraph


def _rows(df):
    return {(r.u, r.v): r for r in df.collect()}


def test_path_graph_scores(spark):
    # P4: 1-2-3-4. Candidates: (1,3) via 2 and (2,4) via 3; (1,4) has
    # no common neighbor.
    g = LinkGraph(
        spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    )
    got = _rows(link_prediction_scores(g))
    assert set(got) == {(1, 3), (2, 4)}
    r = got[(1, 3)]
    assert r.cn == 1
    # deg(1)=1, deg(3)=2 → |union| = 1 + 2 - 1 = 2
    assert abs(r.jaccard - 0.5) < 1e-15
    assert abs(r.adamic_adar - 1.0 / math.log(2)) < 1e-7
    assert r.pref_attach == 2


def test_square_graph_two_common_neighbors(spark):
    # C4: 1-2-3-4-1. Diagonals (1,3) and (2,4) share two centers each.
    g = LinkGraph(
        spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
        )
    )
    got = _rows(link_prediction_scores(g))
    assert set(got) == {(1, 3), (2, 4)}
    r = got[(1, 3)]
    assert r.cn == 2
    assert abs(r.jaccard - 1.0) < 1e-15  # union == intersection == {2,4}
    assert abs(r.adamic_adar - 2.0 / math.log(2)) < 1e-7
    assert r.pref_attach == 4


def test_existing_edges_are_excluded(spark):
    # triangle: every pair is adjacent → no candidates at all
    g = LinkGraph(
        spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src long, dst long")
    )
    assert link_prediction_scores(g).count() == 0


def test_hub_cap_drops_super_hub_centers(spark):
    # star 0-(1..5): all leaf pairs are candidates via the hub...
    edges = [(0, i) for i in range(1, 6)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    assert link_prediction_scores(g).count() == 10
    # ...but with the hub (deg 5) over the center cap, no wedge
    # centers remain
    assert (
        link_prediction_scores(g, max_center_degree=3).count() == 0
    )


def test_min_common_filter(spark):
    g = LinkGraph(
        spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
        )
    )
    assert link_prediction_scores(g, min_common=2).count() == 2
    assert link_prediction_scores(g, min_common=3).count() == 0


def test_multigraph_grouping(spark):
    # same P3 in two graph_ids → per-graph candidate rows
    edges = [(0, 1, 2), (0, 2, 3), (1, 1, 2), (1, 2, 3)]
    g = LinkGraph(
        spark.createDataFrame(edges, "graph_id long, src long, dst long")
    )
    out = link_prediction_scores(g)
    rows = {(r.graph_id, r.u, r.v): r.cn for r in out.collect()}
    assert rows == {(0, 1, 3): 1, (1, 1, 3): 1}


# ---------------------------------------------------------------------------
# co-citation / bibliographic coupling
# ---------------------------------------------------------------------------
def test_cocitation_golden(spark):
    from dachshund_spark.algorithms.linkpred import cocitation

    # c1 cites {a, b}; c2 cites {a, b}; c3 cites {a} only
    edges = [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    rows = {(r.u, r.v): r.weight for r in cocitation(g).collect()}
    assert rows == {(1, 2): 2}


def test_coupling_is_cocitation_of_reversed_graph(spark):
    from dachshund_spark.algorithms.linkpred import (
        bibliographic_coupling,
        cocitation,
    )

    edges = [(1, 5), (2, 5), (1, 6), (3, 6), (2, 6), (4, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rev = df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    got = sorted(
        (r.u, r.v, r.weight)
        for r in bibliographic_coupling(LinkGraph(df)).collect()
    )
    want = sorted(
        (r.u, r.v, r.weight) for r in cocitation(LinkGraph(rev)).collect()
    )
    assert got == want and len(got) > 0


def test_cocitation_hub_cap(spark):
    from dachshund_spark.algorithms.linkpred import cocitation

    # a directory page citing 10 targets; cap excludes it entirely
    edges = [(0, i) for i in range(1, 11)] + [(100, 1), (100, 2)]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    full = {(r.u, r.v): r.weight for r in cocitation(g).collect()}
    assert len(full) == 45  # all pairs of the directory's 10 targets
    assert full[(1, 2)] == 2  # co-cited by both 0 and 100
    rows = {
        (r.u, r.v): r.weight
        for r in cocitation(g, max_center_degree=5).collect()
    }
    assert rows == {(1, 2): 1}  # only the small citer survives


def test_resource_allocation_terms(spark):
    # path u-w-v where deg(w)=2: RA = 1/2 exactly; star center with
    # deg 4 contributes 1/4 to each leaf pair
    from dachshund_spark.graph import LinkGraph
    from dachshund_spark.algorithms.linkpred import link_prediction_scores

    edges = [(1, 2), (2, 3)] + [(10, k) for k in (11, 12, 13, 14)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {(r.u, r.v): r.resource_alloc
           for r in link_prediction_scores(LinkGraph(df)).collect()}
    assert out[(1, 3)] == 0.5
    assert out[(11, 12)] == 0.25
