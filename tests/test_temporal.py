"""Temporal reachability — time-respecting semantics on hand graphs."""

from dachshund_spark.algorithms.temporal import temporal_earliest_arrival


def test_decreasing_times_block_paths(spark):
    # 1 -(t=5)-> 2 -(t=3)-> 3: 3 is NOT reachable (3 < 5); 2 arrives at 5
    e = spark.createDataFrame([(1, 2, 5), (2, 3, 3)], ["src", "dst", "t"])
    got = {
        r["node_id"]: r["arrival"]
        for r in temporal_earliest_arrival(e, 1, iterations=5).collect()
    }
    assert got == {1: 0, 2: 5}


def test_earliest_arrival_prefers_waiting_path(spark):
    # two routes to 4: direct at t=9, or 1->2 (t=1) -> 4 (t=3): arrives 3
    e = spark.createDataFrame(
        [(1, 4, 9), (1, 2, 1), (2, 4, 3)], ["src", "dst", "t"]
    )
    got = {
        r["node_id"]: r["arrival"]
        for r in temporal_earliest_arrival(e, 1, iterations=5).collect()
    }
    assert got[4] == 3 and got[2] == 1


def test_equal_time_transfer_allowed(spark):
    # t >= arr admits same-instant transfer: 1 -(2)-> 2 -(2)-> 3
    e = spark.createDataFrame([(1, 2, 2), (2, 3, 2)], ["src", "dst", "t"])
    got = {
        r["node_id"]: r["arrival"]
        for r in temporal_earliest_arrival(e, 1, iterations=5).collect()
    }
    assert got == {1: 0, 2: 2, 3: 2}
