"""URL template census semantics."""

import pytest

from dachshund_spark.pipeline.curate import url_pattern_census


pytestmark = pytest.mark.quick


def test_digit_runs_collapse(spark):
    rows = [
        (1, "https://a.com/item/12/page/3?x=1"),
        (2, "https://a.com/item/999/page/44"),
        (3, "https://A.COM/item/7/page/1#frag"),
        (4, "https://a.com/about"),
        (5, "https://b.com/item/1/page/2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {(r.host, r.pattern): (r.n_pages, r.n_urls)
           for r in url_pattern_census(df, min_pages=2).collect()}
    # 3 a.com urls share /item/N/page/N (host lowercased, query/frag stripped);
    # /about has 1 page and b.com 1 page -> both below min_pages
    assert got == {("a.com", "/item/N/page/N"): (3, 3)}


def test_duplicate_urls_counted_once_in_n_urls(spark):
    rows = [(i, "https://c.com/p/5") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    r = url_pattern_census(df, min_pages=2).collect()[0]
    assert (r.host, r.pattern, r.n_pages, r.n_urls) == ("c.com", "/p/N", 4, 1)
