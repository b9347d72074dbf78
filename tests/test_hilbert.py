"""Hilbert curve key: reference replay + adjacency property."""

import pytest

from dachshund_spark.bucketed import hilbert_key_frame, hilbert_layout_stats


pytestmark = pytest.mark.quick


def _xy2d(order_bits: int, x: int, y: int) -> int:
    # independent reference (Wikipedia xy2d, Hamilton convention)
    d = 0
    s = 1 << (order_bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_matches_reference_8x8(spark):
    cells = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(cells, "src long, dst long")
    got = {(r.src, r.dst): r.hilbert
           for r in hilbert_key_frame(df, bits=3).collect()}
    assert got == {(x, y): _xy2d(3, x, y) for x, y in cells}


def test_consecutive_cells_adjacent(spark):
    cells = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(cells, "src long, dst long")
    rows = hilbert_key_frame(df, bits=4).collect()
    by_d = {r.hilbert: (r.src, r.dst) for r in rows}
    assert len(by_d) == 256  # bijection
    for d in range(255):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1  # no Z-jumps, ever


def test_layout_stats_bucket_bounds(spark):
    cells = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(cells, "src long, dst long")
    rows = hilbert_layout_stats(df, bits=5, bucket_bits=4).collect()
    # 16 buckets x 64 cells each; each bucket is a contiguous curve
    # segment so src/dst spread stays near sqrt(64)
    assert len(rows) == 16
    assert all(r.n_edges == 64 for r in rows)
    assert all(r.n_src <= 16 and r.n_dst <= 16 for r in rows)
