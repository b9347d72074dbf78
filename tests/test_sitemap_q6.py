"""Sitemap <loc> extraction + TPC-H Q6-shaped revenue forecast."""

from datetime import datetime

from pyspark.sql import functions as F

from dachshund_spark.pages.extract import sitemap_entries
from dachshund_spark.relational import revenue_forecast


def test_sitemap_entries_order_and_malformed(spark):
    pages = spark.createDataFrame(
        [
            ("a", "<urlset><url><loc>https://a/1</loc></url>"
                  "<url><loc>https://a/2</loc></url></urlset>"),
            ("b", "no xml here"),
            ("c", "<loc>https://c/only</loc>"),
        ],
        "host string, sitemap_xml string",
    )
    rows = sitemap_entries(pages).collect()
    got = {(r.host, r.entry_idx): r.loc for r in rows}
    assert got == {
        ("a", 0): "https://a/1",
        ("a", 1): "https://a/2",
        ("c", 0): "https://c/only",
    }


def test_revenue_q6_filters_and_sum(spark):
    rows = [
        # (shipdate, qty, price, discount) -> in: 1996, disc in band, qty<24
        (datetime(1996, 3, 1), 10.0, 1000.0, 0.06),   # in: 60.00 -> 600000
        (datetime(1996, 3, 1), 30.0, 1000.0, 0.06),   # out: qty
        (datetime(1996, 3, 1), 10.0, 1000.0, 0.04),   # out: discount low
        (datetime(1996, 3, 1), 10.0, 1000.0, 0.08),   # out: discount high
        (datetime(1995, 3, 1), 10.0, 1000.0, 0.06),   # out: year
        (datetime(1996, 12, 31), 5.0, 250.5, 0.05),   # in: 12.525 -> 125250
    ]
    li = spark.createDataFrame(
        rows, "l_shipdate timestamp, l_quantity double, "
              "l_extendedprice double, l_discount double"
    )
    (r,) = revenue_forecast(li).collect()
    assert r.n_items == 2
    assert r.revenue_e4 == 600000 + 125250


def test_revenue_q6_boundary_discounts_inclusive(spark):
    rows = [
        (datetime(1996, 6, 1), 1.0, 100.0, 0.05),
        (datetime(1996, 6, 1), 1.0, 100.0, 0.07),
    ]
    li = spark.createDataFrame(
        rows, "l_shipdate timestamp, l_quantity double, "
              "l_extendedprice double, l_discount double"
    )
    (r,) = revenue_forecast(li).collect()
    assert r.n_items == 2
