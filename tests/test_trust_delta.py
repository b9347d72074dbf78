"""TrustRank / spam-mass composition and crawl snapshot deltas."""

from pyspark.sql import functions as F

from dachshund_spark.algorithms.delta import snapshot_delta
from dachshund_spark.algorithms.trust import spam_mass, trust_rank
from dachshund_spark.graph import LinkGraph


def test_trusted_core_has_low_spam_mass(spark):
    # trusted clique {1,2,3} linking into each other; spam farm {10,11,
    # 12} boosting node 10 with no in-links from the trusted side
    edges = [
        (1, 2), (2, 3), (3, 1), (2, 1), (3, 2), (1, 3),
        (11, 10), (12, 10), (10, 11), (10, 12),
        (1, 4), (4, 1),  # 4 hangs off the trusted core
    ]
    g = LinkGraph(spark.createDataFrame(edges, "src long, dst long"))
    out = {
        r.node_id: r
        for r in spam_mass(g, trusted=[1, 2, 3], fixed_iterations=20).collect()
    }
    # pages reachable from the trusted core keep most of their rank
    assert out[4].spam_mass < 0.2
    for n in (1, 2, 3):
        assert out[n].spam_mass < 0.35
    # the spam farm earns rank only from teleportation → mass ≈ 1
    for n in (10, 11, 12):
        assert out[n].spam_mass > 0.95
    # trust_rank of un-reachable spam nodes is ~0
    tr = {r.node_id: r.trustrank for r in
          trust_rank(g, trusted=[1, 2, 3], fixed_iterations=20).collect()}
    assert tr[10] < 1e-6 and tr[1] > 0.1


def test_snapshot_delta_golden(spark):
    old = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5)], "src long, dst long"
    )
    new = spark.createDataFrame(
        [(1, 2), (1, 4), (2, 3), (6, 7)], "src long, dst long"
    )
    out = {r.src: r for r in snapshot_delta(old, new).collect()}
    r1 = out[1]  # kept 1→2, lost 1→3, gained 1→4
    assert (r1.n_added, r1.n_removed, r1.n_stable) == (1, 1, 1)
    assert abs(r1.jaccard - 1 / 3) < 1e-15
    assert (out[2].n_added, out[2].n_removed, out[2].n_stable) == (0, 0, 1)
    assert out[2].jaccard == 1.0
    # source only in the old snapshot
    assert (out[4].n_added, out[4].n_removed, out[4].n_stable) == (0, 1, 0)
    assert out[4].jaccard == 0.0
    # source only in the new snapshot
    assert (out[6].n_added, out[6].n_removed, out[6].n_stable) == (1, 0, 0)


def test_snapshot_delta_dedups_multi_edges(spark):
    old = spark.createDataFrame([(1, 2), (1, 2)], "src long, dst long")
    new = spark.createDataFrame([(1, 2), (1, 2), (1, 3)], "src long, dst long")
    (r,) = snapshot_delta(old, new).collect()
    assert (r.n_added, r.n_removed, r.n_stable) == (1, 0, 1)


def test_snapshot_delta_multigraph(spark):
    old = spark.createDataFrame(
        [("a", 1, 2), ("b", 1, 2)], "graph_id string, src long, dst long"
    )
    new = spark.createDataFrame(
        [("a", 1, 2), ("b", 1, 3)], "graph_id string, src long, dst long"
    )
    out = {(r.graph_id, r.src): r for r in snapshot_delta(old, new).collect()}
    assert out[("a", 1)].n_stable == 1 and out[("a", 1)].n_added == 0
    assert out[("b", 1)].n_added == 1 and out[("b", 1)].n_removed == 1
