"""WL graph hashing — isomorphism invariance + discrimination."""

from pyspark.sql import functions as F

from dachshund_spark.algorithms.wl import wl_graph_hash, wl_labels
from dachshund_spark.graph import LinkGraph
from tests.fixtures import KARATE_EDGES


def test_wl_hash_isomorphism_invariant(spark):
    # relabel karate by an arbitrary permutation: hash must not move
    perm = {u: (u * 131) % 1009 for u in range(1, 35)}
    g1 = LinkGraph(spark.createDataFrame(KARATE_EDGES, ["src", "dst"]))
    g2 = LinkGraph(
        spark.createDataFrame(
            [(perm[u], perm[v]) for u, v in KARATE_EDGES], ["src", "dst"]
        )
    )
    h1 = wl_graph_hash(g1, rounds=3).first()
    h2 = wl_graph_hash(g2, rounds=3).first()
    assert (h1["n_nodes"], h1["n_edges"], h1["wl_hash"]) == (
        h2["n_nodes"],
        h2["n_edges"],
        h2["wl_hash"],
    )
    assert h1["n_nodes"] == 34 and h1["n_edges"] == 78


def test_wl_hash_separates_structures(spark):
    g1 = LinkGraph(spark.createDataFrame(KARATE_EDGES, ["src", "dst"]))
    # same node/edge count, different wiring: move one edge
    moved = KARATE_EDGES[:-1] + [(15, 16)]
    g3 = LinkGraph(spark.createDataFrame(moved, ["src", "dst"]))
    h1 = wl_graph_hash(g1, rounds=3).first()
    h3 = wl_graph_hash(g3, rounds=3).first()
    assert (h1["n_nodes"], h1["n_edges"]) == (h3["n_nodes"], h3["n_edges"])
    assert h1["wl_hash"] != h3["wl_hash"]


def test_wl_labels_refine_degree_classes(spark):
    # path 1-2-3-4: ends vs middles split at round 0 (degree) and stay
    g = LinkGraph(spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"]))
    labs = {r["node_id"]: r["wl_label"] for r in wl_labels(g, rounds=2).collect()}
    assert labs[1] == labs[4] and labs[2] == labs[3] and labs[1] != labs[2]
