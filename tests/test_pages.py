import pytest
from pyspark.sql import functions as F

from dachshund_spark import LinkGraph
from dachshund_spark.pages import (
    extract_text,
    generate_pages,
    node_url,
    pages_to_edges,
)
from dachshund_spark.pages.extract import extract_hrefs, extract_text_py
from tests.fixtures import KARATE_EDGES


@pytest.fixture(scope="module")
def karate_pages(spark):
    return generate_pages(LinkGraph.from_edgelist(spark, KARATE_EDGES)).persist()


def test_schema(karate_pages):
    assert karate_pages.schema.simpleString() == (
        "struct<url:string,warc_ts:timestamp,html:binary,text:string,lang:string>"
    )
    assert karate_pages.count() == 34


def test_extracted_text_byte_identical(karate_pages):
    # the byte-identical contract: pinned extractor output == stored text
    mismatches = karate_pages.where(
        extract_text(F.col("html")) != F.col("text")
    ).count()
    assert mismatches == 0


def test_python_reference_extractor_agrees(karate_pages):
    # vectorized pandas UDF == single-string reference implementation
    rows = karate_pages.select("html", "text").collect()
    for r in rows:
        assert extract_text_py(bytes(r.html).decode()) == r.text


def test_roundtrip_graph_exact(spark, karate_pages):
    # pages → extractor → edges reproduces the embedded directed graph
    edges_df, nodes = pages_to_edges(karate_pages)
    url_of = {
        r.node_id: r.url for r in nodes.collect()
    }
    assert len(url_of) == 34
    # map hashed ids back through the dictionary
    hash_to_node = {}
    for r in spark.createDataFrame(
        [(n,) for n in range(1, 35)], "n long"
    ).select("n", F.xxhash64(node_url(F.col("n"))).alias("h")).collect():
        hash_to_node[r.h] = r.n
    got = {
        (hash_to_node[r.src], hash_to_node[r.dst]) for r in edges_df.collect()
    }
    assert got == set(KARATE_EDGES)


def test_hrefs_extraction(spark):
    df = spark.createDataFrame(
        [(b'<a href="https://a.com/x">x</a> <A HREF="https://b.com">b</A>',)],
        "html binary",
    )
    out = df.select(extract_hrefs(F.col("html")).alias("h")).first().h
    assert list(out) == ["https://a.com/x", "https://b.com"]


def test_extractor_rules():
    assert extract_text_py("<p>a&amp;b</p>") == "a&b"
    assert extract_text_py("<script>x</script>hi <b>bold</b>") == "hi bold"
    assert extract_text_py("<style>s{}</style>  a\n\n b ") == "a b"
    assert extract_text_py("&lt;tag&gt; &quot;q&quot; &#39;s&#39;") == "<tag> \"q\" 's'"


def test_powerlaw_pages_deterministic(spark):
    g = LinkGraph.powerlaw_graph(spark, 200, 2000, seed=9)
    digest = F.sum(F.pmod(F.xxhash64("html"), F.lit(1 << 40)))
    a = generate_pages(g).agg(digest).first()[0]
    b = generate_pages(g).agg(digest).first()[0]
    assert a == b


def test_host_of_and_host_edges(spark):
    from pyspark.sql import functions as F

    from dachshund_spark.pages.extract import host_edges, host_of

    urls = spark.createDataFrame(
        [
            (1, "https://A.Example.com/x"),
            (2, "https://a.example.com/y"),
            (3, "https://b.example.com"),
            (4, "no-scheme-string"),
        ],
        "node_id long, url string",
    )
    hosts = {r.node_id: r.h for r in urls.select("node_id", host_of(F.col("url")).alias("h")).collect()}
    assert hosts[1] == hosts[2] == "a.example.com"  # case-normalized
    assert hosts[3] == "b.example.com"
    assert hosts[4] == ""  # scheme-less -> empty
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 1)], "src long, dst long"
    )
    he = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_edges(edges, urls).collect()
    }
    assert he == {
        ("a.example.com", "a.example.com"): 1,
        ("a.example.com", "b.example.com"): 2,
        ("b.example.com", "a.example.com"): 1,
    }
    inter = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_edges(edges, urls, drop_intra=True).collect()
    }
    assert ("a.example.com", "a.example.com") not in inter
    assert inter[("a.example.com", "b.example.com")] == 2


def test_extract_anchors_and_table(spark):
    from dachshund_spark.pages.extract import anchor_text_table, extract_anchors

    html = (
        '<html><body>'
        '<a href="https://t.example.com/p">Visit <b>T</b> now</a>'
        "<a href='https://t.example.com/p#frag'>Visit <b>T</b> now</a>"
        '<a href="https://u.example.com">other</a>'
        '<a class="x" href="https://t.example.com/p">rare</a>'
        "</body></html>"
    )
    pages = spark.createDataFrame(
        [("https://src.example.com", bytearray(html, "utf-8"))], "url string, html binary"
    )
    anchors = pages.select(F.explode(extract_anchors(F.col("html"))).alias("a")).collect()
    # inner markup stripped, whitespace collapsed
    assert [r.a.anchor for r in anchors] == ["Visit T now", "Visit T now", "other", "rare"]
    out = {r.dst_url: r for r in anchor_text_table(pages).collect()}
    t = out["https://t.example.com/p"]  # fragment normalized away
    assert t.n_anchors == 3
    assert t.n_unique_texts == 2
    assert t.top_anchor == "Visit T now"  # modal text wins
    assert out["https://u.example.com"].top_anchor == "other"


def test_anchor_top_tie_breaks_lexicographically(spark):
    html = (
        '<a href="https://t.example.com">beta</a>'
        '<a href="https://t.example.com">alpha</a>'
    )
    pages = spark.createDataFrame(
        [("https://s.example.com", bytearray(html, "utf-8"))], "url string, html binary"
    )
    from dachshund_spark.pages.extract import anchor_text_table

    (r,) = anchor_text_table(pages).collect()
    assert r.n_anchors == 2 and r.n_unique_texts == 2
    assert r.top_anchor == "alpha"


def test_generated_pages_anchor_table_matches_in_degree(spark):
    from dachshund_spark.graph import LinkGraph
    from dachshund_spark.pages import generate_pages
    from dachshund_spark.pages.extract import anchor_text_table

    g = LinkGraph(
        spark.createDataFrame(
            [(1, 2), (3, 2), (2, 4), (1, 4), (3, 4)], "src long, dst long"
        )
    )
    out = {r.dst_url: r for r in anchor_text_table(generate_pages(g)).collect()}
    assert out["https://node2.example.com"].n_anchors == 2
    assert out["https://node4.example.com"].n_anchors == 3
    assert out["https://node4.example.com"].top_anchor == "link 4"


def test_page_structure_stats_hand_page(spark):
    from dachshund_spark.pages.extract import page_structure_stats

    html = (
        '<html><head><script src="x.js"></script></head>'
        "<body><p>hi</p>"
        '<a href="https://a.example.com">a</a>'
        '<a href="https://b.example.com">b</a></body></html>'
    )
    pages = spark.createDataFrame(
        [("https://p.example.com", bytearray(html, "utf-8"), "hi a b")],
        "url string, html binary, text string",
    )
    r = page_structure_stats(pages).collect()[0]
    assert r["n_links"] == 2
    assert r["n_scripts"] == 1
    assert r["n_styles"] == 0
    # html, head, script, /script, /head, body, p, /p, 2x(a, /a), /body, /html
    assert r["n_tags"] == 14
    assert r["html_len"] == len(html)
    assert r["text_len"] == 6
    assert r["text_ratio"] == 6 / len(html)
