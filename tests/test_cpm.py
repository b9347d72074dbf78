"""Clique percolation (CPM k=3) — overlapping community semantics."""

import pytest
from pyspark.sql import functions as F

from dachshund_spark.algorithms.cpm import (
    _packed_triangle_ids,
    clique_percolation,
    cpm_community_sizes,
)
from dachshund_spark.algorithms.triangles import triangle_list
from dachshund_spark.graph import LinkGraph

pytestmark = pytest.mark.quick


def _communities(out):
    comms = {}
    for r in out.collect():
        comms.setdefault(r["community"], set()).add(r["node_id"])
    return sorted(comms.values(), key=lambda s: sorted(s))


def test_cpm_merges_edge_sharing_triangles(spark):
    # (1,2,3) and (2,3,4) share edge (2,3) -> one community {1,2,3,4};
    # (10,11,12) is its own; the triangle-free edge (20,21) is absent
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (2, 4), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "src long, dst long",
    )
    out = clique_percolation(LinkGraph(edges))
    assert _communities(out) == [{1, 2, 3, 4}, {10, 11, 12}]


def test_cpm_vertex_overlap_membership(spark):
    # bowtie: triangles (1,2,3) and (3,4,5) share only VERTEX 3 — CPM
    # k=3 keeps them as separate communities, and node 3 is in BOTH
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)], "src long, dst long"
    )
    out = clique_percolation(LinkGraph(edges))
    assert _communities(out) == [{1, 2, 3}, {3, 4, 5}]
    assert out.where(F.col("node_id") == 3).count() == 2


def test_cpm_sizes_and_chain_linking(spark):
    # fan of T triangles on one shared edge (0,1): chain linking must
    # connect all of them into ONE community (not T-1 separate ones)
    t = 6
    rows = [(0, 1)] + [(0, 2 + i) for i in range(t)] + [(1, 2 + i) for i in range(t)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    out = clique_percolation(LinkGraph(edges))
    comms = _communities(out)
    assert comms == [set(range(t + 2))]
    sizes = cpm_community_sizes(out).collect()
    assert len(sizes) == 1 and sizes[0]["size"] == t + 2


def test_packed_ids_guard(spark):
    # ids needing >20 bits each would overflow the 62-bit pack budget
    wide = spark.createDataFrame(
        [(1 << 21, (1 << 21) + 1), ((1 << 21) + 1, (1 << 21) + 2),
         ((1 << 21) + 2, 1 << 21)],
        "src long, dst long",
    )
    g = LinkGraph(wide)
    with pytest.raises(ValueError, match="overflow"):
        _packed_triangle_ids(g, triangle_list(g))
