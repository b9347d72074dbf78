"""SemDedup (pipeline/similarity.py:semantic_dedup) and mixture
weights (pipeline/curate.py:mixture_weights)."""

import math

import pytest
from pyspark.sql import functions as F

from dachshund_spark.pipeline.curate import mixture_weights
from dachshund_spark.pipeline.similarity import semantic_dedup


def _vec_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_semdedup_clusters_and_dups(spark):
    # two orthogonal directions; ids 0/1 are the centroids
    e1, e2 = [1.0, 0.0], [0.0, 1.0]
    rows = [
        (0, e1),
        (1, e2),
        (2, [0.99, 0.1]),   # near e1 -> cluster 0, dup of 0
        (3, [0.1, 0.99]),   # near e2 -> cluster 1, dup of 1
        (4, [-1.0, 0.05]),  # anti-parallel to e1: cluster 1 (cos vs e2 > vs e1), no dup
    ]
    vecs = _vec_df(spark, rows)
    out = semantic_dedup(
        vecs, vecs.where(F.col("vec_id") < 2), tau=0.9
    ).collect()
    by = {r.vec_id: r for r in out}
    assert by[0].cluster_id == 0 and by[0].keep
    assert by[2].cluster_id == 0 and by[2].dup_of == 0 and not by[2].keep
    assert by[3].cluster_id == 1 and by[3].dup_of == 1 and not by[3].keep
    assert by[4].keep


def test_semdedup_keeps_smallest_of_chain(spark):
    # three near-identical vectors: only the smallest id survives
    rows = [(0, [1.0, 0.0]), (5, [0.999, 0.01]), (7, [0.998, 0.02])]
    vecs = _vec_df(spark, rows)
    out = {r.vec_id: r for r in semantic_dedup(vecs, vecs.limit(1), tau=0.99).collect()}
    assert out[0].keep
    assert out[5].dup_of == 0 and out[7].dup_of == 0
    assert not out[5].keep and not out[7].keep


def test_semdedup_tau_gate(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    vecs = _vec_df(spark, rows)
    out = semantic_dedup(vecs, vecs.where(F.col("vec_id") == 0), tau=0.5)
    assert all(r.keep for r in out.collect())  # orthogonal: no dups


def test_mixture_weights_sqrt_flattening(spark):
    docs = spark.createDataFrame(
        [(i, "s%d" % (i % 2), 100 if i % 2 == 0 else 400) for i in range(8)],
        "doc_id long, source string, n_chars long",
    )
    out = {r.source: r for r in mixture_weights(docs).collect()}
    # masses 400 vs 1600 -> sqrt terms 20 vs 40 -> weights 1/3 vs 2/3
    assert out["s0"].mass == 400 and out["s1"].mass == 1600
    assert math.isclose(out["s0"].weight, 1 / 3, rel_tol=1e-9)
    assert math.isclose(out["s1"].weight, 2 / 3, rel_tol=1e-9)
    assert math.isclose(sum(r.weight for r in out.values()), 1.0, rel_tol=1e-9)


def test_mixture_weights_temperature_one_is_proportional(spark):
    docs = spark.createDataFrame(
        [(0, "a", 100), (1, "b", 300)],
        "doc_id long, source string, n_chars long",
    )
    out = {r.source: r.weight for r in mixture_weights(docs, temperature=1.0).collect()}
    assert math.isclose(out["b"] / out["a"], 3.0, rel_tol=1e-6)


def test_triplet_mining_batch_hard(spark):
    from dachshund_spark.pipeline.similarity import triplet_mining

    # label 0: anchor [1,0], near-dup [0.9,0.1], far [0,1]
    # label 1: close negative [0.8,0.2], far negative [-1,0]
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.1], 0),
        (2, [0.0, 1.0], 0),
        (3, [0.8, 0.2], 1),
        (4, [-1.0, 0.0], 1),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["anchor_id"]: r for r in
           triplet_mining(emb, emb.where("vec_id = 0")).collect()}
    r = out[0]
    # hardest positive = least similar same-label = vec 2
    assert r["pos_id"] == 2
    # hardest negative = most similar other-label = vec 3
    assert r["neg_id"] == 3
    assert r["margin"] == r["pos_sim"] - r["neg_sim"]
