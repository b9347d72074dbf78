"""TPC-H Q2/Q11/Q16/Q20 shapes over the derived partsupp catalog.

Hand-computed fixtures pin the modular availqty/supplycost formulas and
each query's join/threshold semantics (ties kept, strict compares,
anti-join exclusions).
"""

from datetime import datetime

from dachshund_spark.relational import (
    derived_partsupp,
    important_stock,
    min_cost_supplier,
    promotion_candidates,
    supplier_part_census,
)


def _li(spark, pairs):
    return spark.createDataFrame(
        [(p, s) for p, s in pairs], "l_partkey long, l_suppkey long"
    )


def test_derived_partsupp_formula_and_dedup(spark):
    # repeated pair collapses to one catalog row; formulas are exact
    out = {
        (r.ps_partkey, r.ps_suppkey): (r.ps_availqty, r.ps_supplycost_e2)
        for r in derived_partsupp(_li(spark, [(1, 1), (1, 1), (2, 3)])).collect()
    }
    assert out == {
        (1, 1): ((37 + 101) % 9999 + 1, (13 + 7) % 100000 + 100),
        (2, 3): ((74 + 303) % 9999 + 1, (26 + 21) % 100000 + 100),
    }


def test_min_cost_supplier_ties_and_region(spark):
    region = spark.createDataFrame(
        [(0, "EUROPE"), (1, "ASIA")], "r_regionkey int, r_name string"
    )
    nation = spark.createDataFrame(
        [(10, "FRANCE", 0), (20, "JAPAN", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    # s=1 and s=100001 tie on cost for every part (7·Δs ≡ 0 mod 1e5);
    # s=2 costs more; s=9 is out-of-region and must vanish even though
    # its cost would win.
    supplier = spark.createDataFrame(
        [(1, "s1", 10, 1.0), (100001, "s1b", 10, 2.0),
         (2, "s2", 10, 3.0), (9, "s9", 20, 4.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    part = spark.createDataFrame(
        [(1, "ECONOMY"), (5, "PROMO")], "p_partkey long, p_type string"
    )
    li = _li(spark, [(1, 1), (1, 100001), (1, 2), (1, 9), (5, 1)])
    out = min_cost_supplier(part, supplier, li, nation, region).collect()
    # part 5 is PROMO (filtered); part 1 keeps the two tied suppliers
    assert [(r.p_partkey, r.s_suppkey, r.min_cost_e2) for r in out] == [
        (1, 1, 120), (1, 100001, 120)
    ]
    assert all(r.n_name == "FRANCE" for r in out)
    assert [r.acctbal_cents for r in out] == [100, 200]


def test_important_stock_above_average_cut(spark):
    region = spark.createDataFrame(
        [(0, "EUROPE")], "r_regionkey int, r_name string"
    )
    nation = spark.createDataFrame(
        [(10, "FRANCE", 0)], "n_nationkey int, n_name string, n_regionkey int"
    )
    supplier = spark.createDataFrame(
        [(0, "s0", 10, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    # single supplier 0: value(p) = cost(p,0)·avail(p,0)
    # p=1: 113·38=4294, p=2: 126·75=9450, p=3: 139·112=15568
    # total 29312, n=3 → keep iff v·3·2 > 29312·3 ⇔ v > 14656 → only p=3
    li = _li(spark, [(1, 0), (2, 0), (3, 0)])
    out = important_stock(li, supplier, nation, region).collect()
    assert [(r.ps_partkey, r.value_e2) for r in out] == [(3, 15568)]


def test_supplier_part_census_exclusions(spark):
    supplier = spark.createDataFrame(
        [(1, "s1", 0, 0.0), (2, "s2", 0, 0.0), (7, "s7", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    part = spark.createDataFrame(
        [(1, "Brand#13", "ECONOMY", 4), (2, "Brand#5", "PROMO", 9)],
        "p_partkey long, p_brand string, p_type string, p_size int",
    )
    # supplier 7 (7 % 7 == 0) is the complaint analog; part 1 is the
    # excluded brand — only (2,1) and (2,2) count.
    li = _li(spark, [(2, 1), (2, 2), (2, 7), (1, 1), (1, 2)])
    out = supplier_part_census(part, supplier, li).collect()
    assert [(r.p_brand, r.p_type, r.p_size, r.supplier_cnt) for r in out] == [
        ("Brand#5", "PROMO", 9, 2)
    ]


def test_promotion_candidates_strict_excess_and_window(spark):
    nation = spark.createDataFrame(
        [(10, "FRANCE", 0)], "n_nationkey int, n_name string, n_regionkey int"
    )
    supplier = spark.createDataFrame(
        [(1, "s1", 10, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    part = spark.createDataFrame(
        [(1, "cold widget"), (2, "warm widget"), (3, "plain bolt")],
        "p_partkey long, p_name string",
    )
    in97 = datetime(1997, 6, 1)
    in96 = datetime(1996, 6, 1)
    li = spark.createDataFrame(
        [
            # avail(1,1)=139: qty 1 → 139 > 100 kept
            (1, 1, 1.0, in97),
            # avail(2,1)=176: qty 2 → 176 > 200 fails (strict compare)
            (2, 1, 2.0, in97),
            # out-of-window qty must not count against part 1
            (1, 1, 50.0, in96),
            # non-widget part never qualifies
            (3, 1, 1.0, in97),
        ],
        "l_partkey long, l_suppkey long, l_quantity double, "
        "l_shipdate timestamp",
    )
    out = promotion_candidates(part, supplier, li, nation).collect()
    assert [(r.s_suppkey, r.s_name, r.n_name, r.n_excess_parts)
            for r in out] == [(1, "s1", "FRANCE", 1)]
