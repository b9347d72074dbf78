"""HITS vs a direct numpy replay of the recurrence."""

import numpy as np
import pytest

from dachshund_spark import LinkGraph
from dachshund_spark.algorithms.hits import hits


def _numpy_hits(edges, iters):
    nodes = sorted({u for u, v in edges} | {v for u, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    a = np.zeros((len(nodes), len(nodes)))
    for u, v in set(edges):
        a[idx[u], idx[v]] = 1.0
    hub = np.ones(len(nodes))
    auth = np.ones(len(nodes))
    for _ in range(iters):
        auth = a.T @ hub
        auth = auth / auth.max()
        hub = a @ auth
        hub = hub / hub.max()
    return (
        {nodes[i]: hub[i] for i in range(len(nodes))},
        {nodes[i]: auth[i] for i in range(len(nodes))},
    )


def test_hits_matches_numpy(spark):
    edges = [(1, 2), (1, 3), (2, 3), (4, 3), (3, 5), (2, 5)]
    g = LinkGraph.from_edgelist(spark, edges)
    out = {r.node_id: (r.hub, r.auth) for r in hits(g, fixed_iterations=12).collect()}
    nh, na = _numpy_hits(edges, 12)
    for n in nh:
        assert abs(out[n][0] - nh[n]) <= 1e-9
        assert abs(out[n][1] - na[n]) <= 1e-9
    # node 3 receives from 1, 2, 4: the authority; hub peak at 1 or 2
    assert out[3][1] == 1.0
    assert out[4][1] == 0.0  # nothing points at 4


def test_hits_converged(spark):
    edges = [(1, 2), (1, 3), (2, 3)]
    g = LinkGraph.from_edgelist(spark, edges)
    out = {r.node_id: (r.hub, r.auth) for r in hits(g).collect()}
    # hub(1) dominates (points at both authorities), auth(3) dominates
    assert out[1][0] == 1.0 and out[3][1] == 1.0


def test_salsa_converges_to_degree_proportional(spark):
    """On a single authority-connected component, SALSA's stationary
    authority (hub) vector is proportional to in-degree (out-degree) —
    Lempel & Moran 2000 Thm 1 — so max-normalized scores are
    indeg/max_indeg."""
    from dachshund_spark.algorithms.hits import salsa
    from dachshund_spark.graph import LinkGraph

    # u1 -> {v1, v2}, u2 -> v1 : indeg(v1)=2, indeg(v2)=1,
    # outdeg(u1)=2, outdeg(u2)=1
    edges = spark.createDataFrame(
        [(10, 1), (10, 2), (20, 1)], "src long, dst long"
    )
    out = {
        r.node_id: (r.hub, r.auth)
        # geometric rate 1/2 per superstep -> 2^-20 ≈ 1e-6 residual
        for r in salsa(LinkGraph(edges), fixed_iterations=20).collect()
    }
    assert out[1][1] == pytest.approx(1.0, abs=1e-5)
    assert out[2][1] == pytest.approx(0.5, abs=1e-5)
    assert out[10][0] == pytest.approx(1.0, abs=1e-5)
    assert out[20][0] == pytest.approx(0.5, abs=1e-5)
    # nodes with no out-edges have hub 0; no in-edges -> auth 0
    assert out[1][0] == 0.0 and out[10][1] == 0.0


def test_salsa_damps_tightly_knit_bias(spark):
    """The classic HITS failure: a small complete bipartite clump
    outscores a popular-but-sparse authority.  SALSA's degree
    normalization keeps the high-indegree node on top."""
    from dachshund_spark.algorithms.hits import hits, salsa
    from dachshund_spark.graph import LinkGraph

    rows = []
    # popular authority 100: ten distinct hubs point at it (each hub
    # also points somewhere unique, so they are not a clique)
    for i in range(10):
        rows.append((i, 100))
        rows.append((i, 200 + i))
    # tightly-knit community: 4 hubs x 4 authorities complete bipartite
    # (double-step eigenvalue 16 > the star's 10, so HITS concentrates
    # here; SALSA still ranks by in-degree, 10 > 4)
    for h in (50, 51, 52, 53):
        for a in (300, 301, 302, 303):
            rows.append((h, a))
    edges = spark.createDataFrame(rows, "src long, dst long")
    g = LinkGraph(edges)
    s = {r.node_id: r.auth for r in salsa(g, fixed_iterations=12).collect()}
    h = {r.node_id: r.auth for r in hits(g, fixed_iterations=12).collect()}
    # HITS concentrates on the clump; SALSA ranks the popular node first
    assert h[300] > h[100]
    assert s[100] > s[300]
