"""Mutual-NN + kNN label agreement goldens."""

import pytest

from dachshund_spark.pipeline.similarity import (
    knn_label_agreement,
    mutual_nearest_neighbors,
)


pytestmark = pytest.mark.quick


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_mutual_nn_pairs(spark):
    # two tight pairs + one loner whose NN is not reciprocated
    rows = [
        (0, [0.0, 0.0], 0), (1, [0.000001, 0.0], 0),     # pair A
        (10, [1.0, 1.0], 1), (11, [1.0, 1.000001], 1),   # pair B
        (20, [0.4, 0.4], 2),                              # loner
    ]
    got = {(r.a, r.b) for r in mutual_nearest_neighbors(_emb(spark, rows)).collect()}
    assert got == {(0, 1), (10, 11)}


def test_knn_label_agreement(spark):
    # 4 points of label 0 clustered, 4 of label 1 clustered, one
    # label-0 point planted inside cluster 1 (the "mislabel")
    rows = (
        [(i, [0.0, float(i) * 1e-6], 0) for i in range(4)]
        + [(10 + i, [1.0, float(i) * 1e-6], 1) for i in range(4)]
        + [(99, [1.0, 2.5e-6], 0)]
    )
    got = {r.vec_id: (r.n_same, r.n_diff)
           for r in knn_label_agreement(_emb(spark, rows), k=3).collect()}
    # the planted point's 3 NNs are all label 1 -> full disagreement
    assert got[99] == (0, 3)
    # core cluster-0 points agree with all 3 same-label neighbors
    assert got[0] == (3, 0)
