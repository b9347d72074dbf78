"""Silhouette + per-dim MI semantics."""

import math

import pytest

from pyspark.sql import functions as F

from dachshund_spark.pipeline.clustering import (
    dim_mutual_information,
    kmeans_assignments,
    silhouette_simplified,
)


pytestmark = pytest.mark.quick


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_silhouette_separable_clusters(spark):
    # seeds are the two smallest ids — interleave so each true cluster
    # contributes one seed
    rows = [(2 * i, [1.0, 0.0], 0) for i in range(4)] + [
        (2 * i + 1, [0.0, 1.0], 1) for i in range(4)
    ]
    emb = _emb(spark, rows)
    sil = silhouette_simplified(emb, k=2, iterations=2).collect()
    # perfectly tight, well-separated clusters: a2 = 0, b2 > 0, sil = 1
    assert all(r.a2 == 0 and r.b2 > 0 and r.sil == 1.0 for r in sil)
    # cluster labels match the kmeans contract
    km = {r.vec_id: r.cluster
          for r in kmeans_assignments(emb, k=2, iterations=2).collect()}
    assert {r.vec_id: r.cluster for r in sil} == km


def test_dim_mi_informative_vs_noise(spark):
    # dim 1 encodes the label exactly; dim 2 is constant (zero MI)
    rows = [(i, [1.0 if i % 2 == 0 else -1.0, 0.5], i % 2) for i in range(32)]
    got = {r.d: (r.mi_num_e8, r.mi) for r in
           dim_mutual_information(_emb(spark, rows)).collect()}
    # dim 1: perfect 2x2 diagonal -> MI = ln 2
    n = 32
    cell = 16
    term = round(math.log((cell * n) / (16 * 16)) * 1e8) * cell
    assert got[1][0] == 2 * term
    assert abs(got[1][1] - math.log(2)) < 1e-6
    # dim 2: single sign cell per label -> MI exactly 0
    assert got[2][0] == 0
