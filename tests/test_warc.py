"""WARC/1.0 container: record codec, gzip members, Spark round-trip."""

from dachshund_spark.pages.warc import (
    gzip_member,
    pages_to_warc_files,
    parse_warc,
    split_gzip_members,
    warc_to_pages,
    write_warc_file,
    write_warc_record,
)


def test_record_roundtrip_plain_and_gzipped():
    recs = [
        ("https://a.example.com", 1_600_000_000, b"<html>A</html>"),
        ("https://b.example.com", 1_600_000_042, b"<html>B \xe2\x9c\x93</html>"),
    ]
    for gz in (False, True):
        data = write_warc_file(recs, gzipped=gz)
        assert list(parse_warc(data)) == recs


def test_gzip_member_split():
    members = [b"first record", b"second", b"third longer payload" * 10]
    blob = b"".join(gzip_member(m) for m in members)
    assert list(split_gzip_members(blob)) == members


def test_non_response_records_skipped():
    rec = write_warc_record("https://x.example.com", 1_600_000_000, b"<x/>")
    info = rec.replace(b"WARC-Type: response", b"WARC-Type: warcinfo", 1)
    got = list(parse_warc(info + rec))
    assert got == [("https://x.example.com", 1_600_000_000, b"<x/>")]


def test_body_may_contain_crlf_crlf():
    body = b"<html>\r\n\r\npre-formatted</html>"
    rec = write_warc_record("https://y.example.com", 1_600_000_001, body)
    (url, epoch, html), = parse_warc(rec)
    assert html == body and epoch == 1_600_000_001


def test_spark_pages_warc_roundtrip(spark):
    from pyspark.sql import functions as F

    from dachshund_spark.graph import LinkGraph
    from dachshund_spark.pages import generate_pages

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 1)], "src long, dst long"
    )
    pages = generate_pages(LinkGraph(edges))
    files = pages_to_warc_files(pages, num_files=2, gzipped=True)
    parsed = warc_to_pages(files)
    back = {r["url"]: r for r in parsed.collect()}
    for r in pages.collect():
        assert bytes(back[r["url"]]["html"]) == bytes(r["html"])
        assert back[r["url"]]["warc_ts"] == r["warc_ts"]
    assert len(back) == pages.count()


def test_malformed_records_skipped_not_fatal():
    """ADVICE r3: missing Content-Length, fractional-second WARC-Dates
    (WARC 1.1), truncated tails, and leading garbage must not kill the
    task — skip/resync instead."""
    from dachshund_spark.pages.warc import parse_warc, write_warc_record

    good = write_warc_record("http://a/", 1000, b"<p>a</p>")
    # record missing Content-Length entirely
    bad_nolen = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://bad/\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n\r\n"
        b"HTTP/1.1 200 OK\r\n\r\nbody"
    )
    # WARC 1.1 fractional-second date — must PARSE (truncated)
    frac = write_warc_record("http://f/", 2000, b"<p>f</p>").replace(
        b"WARC-Date: 1970-01-01T00:33:20Z",
        b"WARC-Date: 1970-01-01T00:33:20.123456Z",
    )
    stream = b"junkjunk\r\n" + bad_nolen + b"\r\n" + good + frac + b"\r\ntrailing"
    out = list(parse_warc(stream))
    assert [(u, t) for u, t, _ in out] == [("http://a/", 1000), ("http://f/", 2000)]

    import pytest as _pytest
    with _pytest.raises(ValueError):
        list(parse_warc(bad_nolen, strict=True))


def test_watts_strogatz_rejects_degenerate_k(spark):
    from dachshund_spark.graph import LinkGraph
    import pytest as _pytest

    with _pytest.raises(AssertionError):
        LinkGraph.watts_strogatz(spark, 16, k=0, p_pct=10, seed=1)
    with _pytest.raises(AssertionError):
        LinkGraph.watts_strogatz(spark, 4, k=4, p_pct=10, seed=1)
