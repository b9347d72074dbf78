"""Largest-remainder apportionment + gap-encoding bit stats."""

from pyspark.sql import functions as F

from dachshund_spark.algorithms.stats import gap_encoding_stats
from dachshund_spark.pipeline.curate import largest_remainder_allocation


def test_largest_remainder_sums_exactly_and_is_fair(spark):
    w = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 1), ("d", 1)], ["key", "weight"]
    )
    out = {r["key"]: r["alloc"] for r in largest_remainder_allocation(w, total=7).collect()}
    assert sum(out.values()) == 7
    # quota: a=3.5, b=2.1, c=d=0.7 → base (3,2,0,0), leftovers 2 go to
    # the largest remainders: a (.5) then c (.7? no — c,d tie at .7 >
    # a's .5): c and d get them
    assert out == {"a": 3, "b": 2, "c": 1, "d": 1}
    # monotone: more weight never means fewer slots
    assert out["a"] >= out["b"] >= out["c"]


def test_largest_remainder_total_exact_on_awkward_weights(spark):
    w = spark.createDataFrame(
        [(f"k{i}", i + 1) for i in range(13)], ["key", "weight"]
    )
    rows = largest_remainder_allocation(w, total=100).collect()
    assert sum(r["alloc"] for r in rows) == 100
    assert all(r["alloc"] >= 0 for r in rows)


def test_gap_bits_by_hand(spark):
    # src 1 → {2, 5, 13}: costs bits(3)+bits(3)+bits(8)=2+2+4=8
    e = spark.createDataFrame(
        [(1, 5), (1, 2), (1, 13), (7, 0)], ["src", "dst"]
    )
    got = {
        r["node_id"]: (r["n_out"], r["gap_bits"])
        for r in gap_encoding_stats(e).collect()
    }
    assert got == {1: (3, 8), 7: (1, 1)}  # 7→0: first gap = 0+1 → 1 bit
