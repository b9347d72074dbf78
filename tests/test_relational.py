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
