"""Farthest-first k-center selection goldens."""

import pytest

from dachshund_spark.pipeline.clustering import k_center_greedy


pytestmark = pytest.mark.quick


def test_line_points(spark):
    # points on a line at 0, 1, 4, 9 (scaled 1e-6 -> q = position)
    rows = [(i, [p * 1e-6], 0) for i, p in enumerate([0.0, 1.0, 4.0, 9.0])]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = [(r.k_order, r.center_id, r.sel_d2)
           for r in k_center_greedy(emb, k=3).orderBy("k_order").collect()]
    # start at id 0 (pos 0); farthest is pos 9 (d2=81); then pos 4
    # (min dist to {0,9} = min(16, 25) = 16)
    assert got == [(1, 0, 0), (2, 3, 81), (3, 2, 16)]


def test_radii_nonincreasing(spark):
    rows = [(i, [float((i * 37) % 101) * 1e-6, float((i * 53) % 97) * 1e-6], 0)
            for i in range(40)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = k_center_greedy(emb, k=6).orderBy("k_order").collect()
    radii = [r.sel_d2 for r in out][1:]
    assert all(a >= b for a, b in zip(radii, radii[1:]))
    assert len({r.center_id for r in out}) == 6
