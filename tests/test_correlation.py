"""Parallel-pivot correlation clustering semantics."""

import hashlib

import pytest

from pyspark.sql import functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.algorithms.correlation import (
    correlation_disagreements,
    correlation_pivot,
    signed_edges,
)


pytestmark = pytest.mark.quick


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _graph(spark, edges):
    return LinkGraph(spark.createDataFrame(edges, "src long, dst long"))


def test_pivot_invariants(spark):
    edges = [(i, (i * 7 + 3) % 40) for i in range(40)]
    g = _graph(spark, edges)
    got = {r.node_id: r.cluster for r in correlation_pivot(g).collect()}
    # total assignment; every cluster label is a member of its own cluster
    assert all(got[c] == c for c in set(got.values()))
    # each pivot has minimal priority within its cluster
    for n, c in got.items():
        assert _md5_long(f"cp0#{c}") <= _md5_long(f"cp0#{n}") or n == c

    # clusters span only +edges: every non-pivot member is a +neighbor
    pos = {
        (r.src, r.dst)
        for r in signed_edges(g).where(F.col("sign") == 1).collect()
    }
    pos |= {(b, a) for a, b in pos}
    for n, c in got.items():
        if n != c:
            assert (n, c) in pos


def test_deterministic(spark):
    edges = [(i, (i * 5 + 1) % 30) for i in range(30)]
    g = _graph(spark, edges)
    a = sorted(map(tuple, correlation_pivot(g).collect()))
    b = sorted(map(tuple, correlation_pivot(g).collect()))
    assert a == b


def test_disagreements_bounds(spark):
    edges = [(i, (i * 3 + 2) % 25) for i in range(25)]
    g = _graph(spark, edges)
    r = correlation_disagreements(g, correlation_pivot(g)).collect()[0]
    assert 0 <= r.disagreements == r.intra_neg + r.inter_pos <= r.n_edges
