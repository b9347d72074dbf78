"""Borgatti–Everett core–periphery: Lip's degree-prefix argmin vs an
exhaustive driver-side sweep over every k."""

from dachshund_spark.graph import LinkGraph
from dachshund_spark.algorithms.stats import core_periphery

from tests.fixtures import KARATE_EDGES


def _brute(edges):
    """Exhaustive Z2 over every prefix k of the (degree desc, id asc)
    node order, from degrees alone (Lip's identity)."""
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    order = sorted(deg, key=lambda n: (-deg[n], n))
    total = sum(deg.values())
    best = None
    cum = 0
    for k, node in enumerate(order, start=1):
        cum += deg[node]
        z2 = k * (k - 1) + total - 2 * cum
        if best is None or z2 < best[1]:
            best = (k, z2, deg[node])
    return best, len(order), total


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return core_periphery(LinkGraph(df)).collect()


def test_star_is_ideal(spark):
    rows = _run(spark, [(0, i) for i in range(1, 5)])
    assert len(rows) == 1
    r = rows[0]
    # a star IS the ideal BE pattern: zero errors, core = the hub
    assert (r.k_star, r.z2_min, r.boundary_degree) == (1, 0, 4)
    assert (r.n_nodes, r.degree_total) == (5, 8)


def test_matches_exhaustive_on_karate(spark):
    (k, z2, bd), n, total = _brute(KARATE_EDGES)
    r = _run(spark, KARATE_EDGES)[0]
    assert (r.k_star, r.z2_min, r.boundary_degree) == (k, z2, bd)
    assert (r.n_nodes, r.degree_total) == (n, total)


def test_matches_exhaustive_on_clique_plus_path(spark):
    # K5 with a pendant path: the core should absorb the clique
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    edges += [(4, 10), (10, 11), (11, 12)]
    (k, z2, bd), n, total = _brute(edges)
    r = _run(spark, edges)[0]
    assert (r.k_star, r.z2_min, r.boundary_degree) == (k, z2, bd)
