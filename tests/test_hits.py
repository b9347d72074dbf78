"""HITS vs a direct numpy replay of the recurrence."""

import numpy as np

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
