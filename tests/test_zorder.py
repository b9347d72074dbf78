"""Morton/Z-order edge layout: interleave math + tile locality."""

from pyspark.sql import functions as F

from dachshund_spark.bucketed import morton_key, zorder_layout_stats


def _morton_py(s, d, bits):
    k = 0
    for i in range(bits):
        k |= ((s >> i) & 1) << (2 * i + 1)
        k |= ((d >> i) & 1) << (2 * i)
    return k


def test_morton_key_matches_reference_bits(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (1023, 1023), (512, 7)]
    df = spark.createDataFrame(rows, "src long, dst long").select(
        "src", "dst", morton_key("src", "dst", bits=10).alias("k")
    )
    for r in df.collect():
        assert r["k"] == _morton_py(r["src"], r["dst"], 10)


def test_zorder_tiles_bound_both_dimensions(spark):
    # full 32x32 grid, 4 top bits -> 16 tiles of 8x8: every bucket must
    # touch at most 8 distinct src AND 8 distinct dst (src-only
    # layouts bound one dimension; Z-order bounds both)
    rows = [(s, d) for s in range(32) for d in range(32)]
    e = spark.createDataFrame(rows, "src long, dst long")
    out = zorder_layout_stats(e, bits=5, bucket_bits=4).collect()
    assert len(out) == 16
    for r in out:
        assert r["n_edges"] == 64
        assert r["n_src"] == 8 and r["n_dst"] == 8
