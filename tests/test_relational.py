"""Relational star-join queries: Q5 local supplier volume semantics."""

from datetime import datetime

from dachshund_spark.relational import local_supplier_volume


def test_local_supplier_volume_same_nation_only(spark):
    region = spark.createDataFrame(
        [(0, "ASIA"), (1, "EUROPE")], "r_regionkey int, r_name string"
    )
    nation = spark.createDataFrame(
        [(10, "JAPAN", 0), (11, "CHINA", 0), (20, "FRANCE", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    supplier = spark.createDataFrame(
        [(1, "s1", 10), (2, "s2", 11), (3, "s3", 20)],
        "s_suppkey long, s_name string, s_nationkey int",
    )
    customer = spark.createDataFrame(
        [(100, "c1", 10), (101, "c2", 11), (102, "c3", 20)],
        "c_custkey long, c_name string, c_nationkey int",
    )
    ts = datetime(1996, 6, 1)
    late = datetime(1997, 6, 1)
    orders = spark.createDataFrame(
        [(1000, 100, ts), (1001, 101, ts), (1002, 100, late)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    lineitem = spark.createDataFrame(
        [
            # order 1000 (cust nation 10): supp 1 (10) matches, supp 2 (11) not
            (1000, 1, 100.0, 0.0),
            (1000, 2, 999.0, 0.0),
            # order 1001 (cust nation 11): supp 2 matches
            (1001, 2, 50.0, 0.5),
            # order 1002 outside the date window
            (1002, 1, 777.0, 0.0),
        ],
        "l_orderkey long, l_suppkey long, l_extendedprice double, l_discount double",
    )
    out = local_supplier_volume(
        customer, orders, lineitem, supplier, nation, region
    ).collect()
    got = {r["n_name"]: r["revenue_e4"] for r in out}
    assert got == {"JAPAN": 100_0000, "CHINA": 25_0000}
    # ordered by revenue desc
    assert [r["n_name"] for r in out] == ["JAPAN", "CHINA"]


def test_funnel_strict_ordering(spark):
    from datetime import datetime

    from dachshund_spark.relational import funnel

    t = lambda m: datetime(2024, 1, 1, 0, m)
    rows = [
        # u1 completes all three in order
        (1, "view", t(1)), (1, "click", t(2)), (1, "purchase", t(3)),
        # u2 clicks BEFORE viewing -> stuck at step 1
        (2, "click", t(1)), (2, "view", t(2)),
        # u3 view+click but purchase precedes click -> step 2
        (3, "view", t(1)), (3, "purchase", t(2)), (3, "click", t(3)),
        # u4 never views
        (4, "purchase", t(1)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {r["user_id"]: r["reached"] for r in
           funnel(ev, ["view", "click", "purchase"]).collect()}
    assert got == {1: 3, 2: 1, 3: 2, 4: 0}


def test_retention_cohorts_offsets(spark):
    from datetime import datetime

    from dachshund_spark.relational import retention_cohorts

    rows = [
        (1, datetime(2024, 1, 2)),   # week 0
        (1, datetime(2024, 1, 10)),  # week 1 -> offset 1
        (2, datetime(2024, 1, 9)),   # first seen week 1
        (2, datetime(2024, 1, 30)),  # week 4 -> offset 3
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r["cohort_week"], r["week_offset"]): r["n_users"]
           for r in retention_cohorts(ev, weeks=4).collect()}
    assert got == {(0, 0): 1, (0, 1): 1, (1, 0): 1, (1, 3): 1}


def test_gap_fill_hourly_zero_rows(spark):
    from datetime import datetime

    from dachshund_spark.relational import gap_fill_hourly

    rows = [
        (1, "a", datetime(2024, 1, 1, 0, 30)),
        (2, "a", datetime(2024, 1, 1, 3, 10)),  # hours 1,2 silent
        (3, "b", datetime(2024, 1, 1, 1, 5)),
    ]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp")
    out = {(r["event_type"], r["hour"].hour): r["n_events"]
           for r in gap_fill_hourly(ev).collect()}
    # 4 hours x 2 types = 8 dense cells
    assert len(out) == 8
    assert out[("a", 0)] == 1 and out[("a", 1)] == 0 and out[("a", 2)] == 0
    assert out[("a", 3)] == 1 and out[("b", 1)] == 1 and out[("b", 0)] == 0


def test_decayed_counts_dyadic(spark):
    from datetime import datetime

    from dachshund_spark.relational import decayed_counts

    rows = [
        (1, "a", datetime(2024, 1, 10)),  # age 0 -> 2^40
        (2, "a", datetime(2024, 1, 9)),   # age 1 -> 2^39
        (3, "a", datetime(2024, 1, 1)),   # age 9 -> 2^31
        (4, "b", datetime(2024, 1, 10)),  # age 0
    ]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp")
    got = {r["event_type"]: (r["n_events"], r["decayed_e40"])
           for r in decayed_counts(ev).collect()}
    assert got["a"] == (3, (1 << 40) + (1 << 39) + (1 << 31))
    assert got["b"] == (1, 1 << 40)


def test_native_session_window_gap_semantics(spark):
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0),
        (1, t0 + timedelta(minutes=29)),                      # same session
        (1, t0 + timedelta(minutes=29 + 30)),                 # == gap: MERGES
        (1, t0 + timedelta(minutes=29 + 30 + 30, seconds=1)), # > gap: NEW
        (2, t0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.col("w.start").alias("s"), "n")
        .collect()
    )
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r["n"])
    # exactly-30-min gap merges (inclusive); strictly greater breaks
    assert sorted(per_user[1]) == [1, 3]
    assert per_user[2] == [1]
