"""Round-5 wave C: TPC-H Q7/Q8/Q13/Q14/Q18-shaped relational operators.

Semantics pins the DuckDB oracles can't express as crisply: zero-order
customers in the Q13 histogram, the Q18 strict-> threshold boundary,
and Q7's direction filter (intra-region trade excluded, both cross
directions kept).
"""

import datetime

import pytest

pytestmark = pytest.mark.quick


def _dims(spark):
    region = spark.createDataFrame(
        [(0, "ASIA"), (1, "EUROPE")], "r_regionkey int, r_name string"
    )
    nation = spark.createDataFrame(
        [(0, "N_A", 0), (1, "N_B", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    return region, nation


def test_volume_shipping_directions(spark):
    from dachshund_spark.relational import volume_shipping

    region, nation = _dims(spark)
    supplier = spark.createDataFrame(
        [(1, "s1", 0), (2, "s2", 1)], "s_suppkey long, s_name string, s_nationkey int"
    )
    customer = spark.createDataFrame(
        [(10, "c_asia", 0), (11, "c_eur", 1)],
        "c_custkey long, c_name string, c_nationkey int",
    )
    d = datetime.datetime(1997, 6, 1)
    orders = spark.createDataFrame(
        [(100, 10), (101, 11)], "o_orderkey long, o_custkey long"
    )
    # (orderkey, suppkey, price, discount): ASIA->EUROPE, EUROPE->ASIA,
    # and an intra-ASIA line that must be excluded.
    lineitem = spark.createDataFrame(
        [
            (101, 1, 100.0, 0.0, d),   # supp ASIA -> cust EUROPE
            (100, 2, 200.0, 0.5, d),   # supp EUROPE -> cust ASIA
            (100, 1, 999.0, 0.0, d),   # intra-ASIA: excluded
        ],
        "l_orderkey long, l_suppkey long, l_extendedprice double, "
        "l_discount double, l_shipdate timestamp",
    )
    rows = {
        (r.supp_region, r.cust_region): r
        for r in volume_shipping(
            supplier, lineitem, orders, customer, nation, region
        ).collect()
    }
    assert set(rows) == {("ASIA", "EUROPE"), ("EUROPE", "ASIA")}
    assert rows[("ASIA", "EUROPE")].revenue_e4 == 100_0000
    assert rows[("EUROPE", "ASIA")].revenue_e4 == 100_0000
    assert rows[("ASIA", "EUROPE")].l_year == 1997


def test_cust_order_dist_includes_zero(spark):
    from dachshund_spark.relational import customer_order_distribution

    customer = spark.createDataFrame(
        [(1,), (2,), (3,)], "c_custkey long"
    )
    orders = spark.createDataFrame(
        [(10, 1, "1-URGENT"), (11, 1, "5-LOW"), (12, 2, "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    # cust 1: one qualifying order (5-LOW excluded); cust 2: zero after
    # exclusion; cust 3: zero with no orders at all.
    rows = {
        r.c_count: r.custdist
        for r in customer_order_distribution(customer, orders).collect()
    }
    assert rows == {0: 2, 1: 1}


def test_large_volume_threshold_strict(spark):
    from dachshund_spark.relational import large_volume_customers

    customer = spark.createDataFrame(
        [(1, "c1")], "c_custkey long, c_name string"
    )
    d = datetime.datetime(1997, 1, 1)
    orders = spark.createDataFrame(
        [(10, 1, d, 1000.0), (11, 1, d, 2000.0)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_totalprice double",
    )
    lineitem = spark.createDataFrame(
        [(10, 150.0), (11, 151.0)], "l_orderkey long, l_quantity double"
    )
    out = large_volume_customers(customer, orders, lineitem, min_qty=150)
    rows = out.collect()
    # order 10 sums to exactly 150 -> excluded (strict >)
    assert [r.o_orderkey for r in rows] == [11]
    assert rows[0].sum_qty == 151 and rows[0].totalprice_cents == 200000


def test_promo_effect_share(spark):
    from dachshund_spark.relational import promo_revenue_effect

    d = datetime.datetime(1997, 9, 15)
    part = spark.createDataFrame(
        [(1, "PROMO"), (2, "ECONOMY")], "p_partkey long, p_type string"
    )
    lineitem = spark.createDataFrame(
        [(1, 100.0, 0.0, d), (2, 300.0, 0.0, d)],
        "l_partkey long, l_extendedprice double, l_discount double, "
        "l_shipdate timestamp",
    )
    r = promo_revenue_effect(lineitem, part).collect()[0]
    assert (r.promo_rev_e4, r.total_rev_e4) == (100_0000, 400_0000)
    assert r.promo_share_pct == 25.0


def test_small_qty_cleared_denominator(spark):
    from dachshund_spark.relational import small_quantity_revenue

    part = spark.createDataFrame([(1, "Brand#1")], "p_partkey long, p_brand string")
    # part 1: quantities 1, 9, 10 -> sum 20, n 3; qualify iff 15*qty < 20
    # -> only qty 1. Boundary: qty*15=15 < 20 ok; qty 9 -> 135 no.
    lineitem = spark.createDataFrame(
        [(1, 1.0, 50.0), (1, 9.0, 70.0), (1, 10.0, 90.0)],
        "l_partkey long, l_quantity double, l_extendedprice double",
    )
    r = small_quantity_revenue(lineitem, part).collect()[0]
    assert (r.n_rows, r.sum_price_cents) == (1, 5000)
    assert r.avg_yearly == 5000 / 700.0


def test_sole_late_suppliers_blame(spark):
    import datetime

    from dachshund_spark.relational import sole_late_suppliers

    d0 = datetime.datetime(1997, 1, 1)
    late = d0 + datetime.timedelta(days=120)
    ok = d0 + datetime.timedelta(days=10)
    supplier = spark.createDataFrame(
        [(1, "s1"), (2, "s2"), (3, "s3")], "s_suppkey long, s_name string"
    )
    orders = spark.createDataFrame(
        [(100, "F", d0), (200, "F", d0), (300, "O", d0)],
        "o_orderkey long, o_orderstatus string, o_orderdate timestamp",
    )
    lineitem = spark.createDataFrame(
        [
            # order 100: s1 late, s2 on time -> s1 blamed
            (100, 1, late), (100, 2, ok),
            # order 200: BOTH late -> nobody blamed (n_late=2)
            (200, 1, late), (200, 3, late),
            # order 300: not status F -> ignored entirely
            (300, 1, late), (300, 2, ok),
        ],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp",
    )
    rows = sole_late_suppliers(supplier, lineitem, orders).collect()
    assert [(r.s_name, r.numwait) for r in rows] == [("s1", 1)]


def test_dormant_rich_customers(spark):
    import datetime

    from dachshund_spark.relational import dormant_rich_customers

    nation = spark.createDataFrame(
        [(0, "N0"), (1, "N1")], "n_nationkey int, n_name string"
    )
    customer = spark.createDataFrame(
        [
            (1, 0, 100.0),   # above avg of positives (avg=55), dormant -> kept
            (2, 0, 10.0),    # below avg -> dropped
            (3, 1, 100.0),   # above avg but has a recent order -> dropped
            (4, 1, -50.0),   # negative: excluded from the average, below it anyway
        ],
        "c_custkey long, c_nationkey int, c_acctbal double",
    )
    orders = spark.createDataFrame(
        [(10, 3, datetime.datetime(2000, 1, 1))],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    rows = dormant_rich_customers(
        customer, orders, nation, nation_keys=(0, 1)
    ).collect()
    assert [(r.n_name, r.numcust, r.total_acctbal_cents) for r in rows] == [
        ("N0", 1, 10000)
    ]
