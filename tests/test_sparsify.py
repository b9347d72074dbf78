"""L-Spar sparsification — cross-checked against a pure-Python
recompute on the karate club, plus structural invariants."""

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from dachshund_spark.algorithms.sparsify import lspar_sparsify
from dachshund_spark.graph import LinkGraph
from tests.fixtures import KARATE_EDGES


def _lspar_py(edges, min_keep=1):
    import math

    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    canon = sorted({(min(u, v), max(u, v)) for u, v in edges})
    key = {}
    for u, v in canon:
        t = len(adj[u] & adj[v])
        key[(u, v)] = (t * 1_000_000_000) // (len(adj[u]) + len(adj[v]) - t)
    kept = set()
    for node in adj:
        inc = sorted(
            ((min(node, n), max(node, n)) for n in adj[node]),
            key=lambda e: (-key[e], e[0] + e[1] - node),
        )
        budget = max(math.ceil(math.sqrt(len(adj[node]))), min_keep)
        kept.update(inc[:budget])
    return kept


@pytest.fixture(scope="module")
def karate(spark):
    return LinkGraph(spark.createDataFrame(KARATE_EDGES, ["src", "dst"]))


def test_lspar_matches_reference_impl(spark, karate):
    got = {
        (r["src"], r["dst"]) for r in lspar_sparsify(karate).collect()
    }
    assert got == _lspar_py(KARATE_EDGES)


def test_lspar_invariants(spark, karate):
    kept = lspar_sparsify(karate)
    orig = {(r["src"], r["dst"]) for r in karate.canonical_edges().collect()}
    got = {(r["src"], r["dst"]) for r in kept.collect()}
    assert got <= orig  # strictly a subset of the input edges
    assert len(got) < len(orig)  # actually sparsifies the karate club
    # min_keep=1: every original node still has at least one edge
    nodes = {n for e in orig for n in e}
    assert {n for e in got for n in e} == nodes
