"""ACL PPR sweep cut — the barbell sanity check: seeding inside one
clique must carve out exactly that clique (the bridge is the unique
minimum-conductance cut)."""

from pyspark.sql import functions as F

from dachshund_spark.algorithms.sweep import ppr_push_integer, sweep_cut
from dachshund_spark.graph import LinkGraph


def _barbell(spark, k=6):
    # two k-cliques {0..k-1} and {k..2k-1} joined by edge (k-1, k)
    edges = []
    for base in (0, k):
        edges += [
            (base + i, base + j) for i in range(k) for j in range(i + 1, k)
        ]
    edges.append((k - 1, k))
    # symmetrize so the directed PPR push sees both directions
    edges = edges + [(v, u) for u, v in edges]
    return LinkGraph(spark.createDataFrame(edges, ["src", "dst"]))


def test_sweep_recovers_clique(spark):
    g = _barbell(spark, k=6)
    out = sweep_cut(g, seed=0, iterations=6, top=12).collect()
    members = {r["node_id"] for r in out}
    assert members == set(range(6))
    assert all(r["sweep_size"] == 6 for r in out)
    # cut crosses exactly the bridge; vol = 5*6 internal ends + 1 bridge end
    assert out[0]["cut"] == 1 and out[0]["vol"] == 31


def test_ppr_push_mass_is_seed_centric(spark):
    g = _barbell(spark, k=6)
    r = {
        row["node_id"]: row["r"]
        for row in ppr_push_integer(g, 0, iterations=6).collect()
    }
    assert max(r, key=r.get) == 0  # seed keeps the most mass
    # every same-clique node outranks every far-clique node
    assert min(r.get(n, 0) for n in range(6)) > max(r.get(n, 0) for n in range(6, 12))
    # total mass never exceeds the scale (truncation only loses mass)
    assert sum(r.values()) <= 10**12