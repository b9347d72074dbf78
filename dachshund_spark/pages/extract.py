"""Pinned HTML extractor: html → text (byte-identical contract) and
html → hrefs[] → edge table.

The extractor is versioned and deterministic: the same html bytes
always produce the same text bytes (EXTRACTOR_VERSION guards the
contract — any rule change bumps it and regenerates goldens).  The
north rule requires byte-identical extracted text per url versus the
pinned extractor; tests enforce ``extract_text(html) == text`` for
every generated page.

Extraction rules (v1, applied in order):
1. drop <script>…</script> and <style>…</style> blocks (with content)
2. replace every remaining tag with a single space
3. decode the five basic entities (&amp; &lt; &gt; &quot; &#39;)
4. collapse whitespace runs to single spaces, strip ends

Everything runs as Arrow-batched pandas UDFs (vectorized pandas string
kernels — no per-row Python in the Spark plan, per input_hint).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

EXTRACTOR_VERSION = 1

_SCRIPT_RE = re.compile(r"(?is)<script\b.*?</script>")
_STYLE_RE = re.compile(r"(?is)<style\b.*?</style>")
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")
_HREF_RE = re.compile(r"""(?i)<a\s[^>]*?href\s*=\s*["']([^"'#>]+)["']""")


def extract_text_py(html: str) -> str:
    """Single-string reference implementation of the pinned rules."""
    s = _SCRIPT_RE.sub(" ", html)
    s = _STYLE_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = (
        s.replace("&lt;", "<")
        .replace("&gt;", ">")
        .replace("&quot;", '"')
        .replace("&#39;", "'")
        .replace("&amp;", "&")
    )
    return _WS_RE.sub(" ", s).strip()


def extract_hrefs_py(html: str) -> list[str]:
    return _HREF_RE.findall(html)


@F.pandas_udf(T.StringType())
def _text_udf(html: pd.Series) -> pd.Series:
    s = html.map(lambda b: b.decode("utf-8", "replace") if isinstance(b, (bytes, bytearray)) else (b or ""))
    s = s.str.replace(_SCRIPT_RE, " ", regex=True)
    s = s.str.replace(_STYLE_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, " ", regex=True)
    for ent, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]:
        s = s.str.replace(ent, ch, regex=False)
    return s.str.replace(_WS_RE, " ", regex=True).str.strip()


@F.pandas_udf(T.ArrayType(T.StringType()))
def _hrefs_udf(html: pd.Series) -> pd.Series:
    return html.map(
        lambda b: _HREF_RE.findall(
            b.decode("utf-8", "replace") if isinstance(b, (bytes, bytearray)) else (b or "")
        )
    )


def extract_text(html_col: Column) -> Column:
    """html (binary or string) → extracted text (pinned, v1)."""
    return _text_udf(html_col)


def extract_hrefs(html_col: Column) -> Column:
    """html → array of raw href targets (absolute urls expected)."""
    return _hrefs_udf(html_col)


# unlike _HREF_RE (edge extraction, where a fragment link is still the
# same edge target) the href here may carry a fragment — normalize_url
# strips it during aggregation
_ANCHOR_RE = re.compile(
    r"""(?is)<a\s[^>]*?href\s*=\s*["']([^"'>]+)["'][^>]*>(.*?)</a>"""
)


@F.pandas_udf(
    T.ArrayType(
        T.StructType(
            [
                T.StructField("href", T.StringType()),
                T.StructField("anchor", T.StringType()),
            ]
        )
    )
)
def _anchors_udf(html: pd.Series) -> pd.Series:
    def _one(b):
        s = b.decode("utf-8", "replace") if isinstance(b, (bytes, bytearray)) else (b or "")
        out = []
        for href, inner in _ANCHOR_RE.findall(s):
            text = _WS_RE.sub(" ", _TAG_RE.sub(" ", inner)).strip()
            out.append((href, text))
        return out

    return html.map(_one)


def extract_anchors(html_col: Column) -> Column:
    """html → array<struct<href, anchor>> — anchor text with inner
    markup stripped by the same pinned tag/whitespace rules as
    :func:`extract_text` (v1)."""
    return _anchors_udf(html_col)


def anchor_text_table(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Per-target anchor-text aggregation:
    ``[dst_url, n_anchors, n_unique_texts, top_anchor]``.

    The classic web-ranking side table (anchor text is among the
    strongest relevance signals — Brin & Page 1998 §2.2 store it per
    target): every ``<a href=X>t</a>`` across the crawl contributes
    (X, t); per target url we keep the incoming-anchor count, distinct
    text count, and the modal text (ties → lexicographically smallest,
    deterministic).  Shape: explode + two groupBys with map-side
    combine; the per-(url, text) count table is the only shuffle whose
    key can skew (a hub url's texts) — counts are already partial
    aggregates, so skew is bounded by distinct texts per url.
    """
    pairs = pages.select(
        F.explode(extract_anchors(F.col(html_col))).alias("a")
    ).select(
        normalize_url(F.col("a.href")).alias("dst_url"),
        F.col("a.anchor").alias("anchor"),
    )
    per_text = pairs.groupBy("dst_url", "anchor").agg(
        F.count(F.lit(1)).alias("n")
    )
    return per_text.groupBy("dst_url").agg(
        F.sum("n").cast("long").alias("n_anchors"),
        F.count(F.lit(1)).cast("long").alias("n_unique_texts"),
        F.min_by(
            "anchor", F.struct(F.negative(F.col("n")).alias("nn"), "anchor")
        ).alias("top_anchor"),
    )


def normalize_url(col: Column) -> Column:
    """Lowercase scheme+host, strip fragments and trailing slash."""
    no_frag = F.regexp_replace(col, r"#.*$", "")
    # lowercase the scheme://host prefix only, keep the path as-is
    scheme_host = F.regexp_extract(no_frag, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1)
    remainder = F.substring(no_frag, F.length(scheme_host) + 1, F.lit(1 << 30))
    normalized = F.when(
        F.length(scheme_host) > 0, F.concat(F.lower(scheme_host), remainder)
    ).otherwise(no_frag)
    return F.regexp_replace(normalized, r"/$", "")


def url_to_node_id(col: Column) -> Column:
    """url → stable 64-bit node id via xxhash64.

    Collision probability over 10^12 urls ≈ 2.7% across the whole
    corpus (birthday bound) — acceptable for link analytics; the nodes
    dictionary retains url↔id so collisions are detectable
    (``pages_to_edges`` exposes the dictionary; SURVEY.md §1.3).
    """
    return F.xxhash64(col)


def pages_to_edges(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> tuple[DataFrame, DataFrame]:
    """pages → (edges(src,dst), nodes(node_id,url)) — the engine's
    ingestion path (SURVEY.md §7 stage 1).

    Only urls that exist as pages become nodes; links to unknown urls
    are dropped (semi join against the page dictionary), mirroring a
    closed-corpus crawl. Column pruning matters at 100 TB: this plan
    reads only (url, html) from the pages table.
    """
    links = pages.select(
        F.col(url_col).alias("src_url"),
        F.explode(extract_hrefs(F.col(html_col))).alias("dst_url_raw"),
    ).select("src_url", normalize_url(F.col("dst_url_raw")).alias("dst_url"))

    nodes = pages.select(
        normalize_url(F.col(url_col)).alias("url")
    ).distinct().select(url_to_node_id(F.col("url")).alias("node_id"), "url")

    edges = (
        links.select(normalize_url(F.col("src_url")).alias("src_url"), "dst_url")
        .join(
            nodes.select(F.col("url").alias("dst_url")), on="dst_url", how="left_semi"
        )
        .select(
            url_to_node_id(F.col("src_url")).alias("src"),
            url_to_node_id(F.col("dst_url")).alias("dst"),
        )
    )
    return edges, nodes


def host_of(col: Column) -> Column:
    """url → host part (the '://'-to-first-'/' span), lowercased.
    Empty string for scheme-less strings (caller filters)."""
    return F.lower(
        F.regexp_extract(col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)", 1)
    )


def host_edges(
    edges: DataFrame,
    nodes: DataFrame,
    drop_intra: bool = False,
) -> DataFrame:
    """url→url edge table collapsed to the HOST graph:
    [src_host, dst_host, n_links].

    ``nodes`` is the (node_id, url) dictionary from
    :func:`pages_to_edges`.  Host-level aggregation is the standard
    first reduction of a web link graph (host PageRank, spam-mass,
    domain dedup run on it): it shrinks a 10^12-edge url graph by the
    pages-per-host factor BEFORE any iterative algorithm pays
    per-superstep cost.  Two dictionary joins (broadcast when the
    dictionary is small, shuffle otherwise — Spark decides by stats) +
    one count aggregation; ``drop_intra=True`` removes same-host
    (navigation) links, the usual prep for host PageRank.
    """
    hosts = nodes.select(
        "node_id", host_of(F.col("url")).alias("host")
    )
    he = (
        edges.join(
            hosts.select(F.col("node_id").alias("src"), F.col("host").alias("src_host")),
            on="src",
        )
        .join(
            hosts.select(F.col("node_id").alias("dst"), F.col("host").alias("dst_host")),
            on="dst",
        )
    )
    if drop_intra:
        he = he.where(F.col("src_host") != F.col("dst_host"))
    return he.groupBy("src_host", "dst_host").agg(
        F.count("*").alias("n_links")
    )


def page_structure_stats(
    pages: DataFrame, html_col: str = "html", text_col: str = "text"
) -> DataFrame:
    """Boilerplate / structure signals per page, computed from the RAW
    html bytes with JVM-side regex counts (no Python in the hot path):
    tag census, link count, and the text-to-html length ratio — the
    classic main-content-density quality gate (low ratio = chrome-heavy
    page).  ``text_ratio`` is a single IEEE division of two exact
    integers, so it is engine-stable.
    """
    h = F.decode(F.col(html_col), "utf-8")
    return pages.select(
        "url",
        F.regexp_count(h, F.lit(r"<a\s")).cast("long").alias("n_links"),
        F.regexp_count(h, F.lit(r"<script\b")).cast("long").alias("n_scripts"),
        F.regexp_count(h, F.lit(r"<style\b")).cast("long").alias("n_styles"),
        F.regexp_count(h, F.lit(r"</?[a-zA-Z]")).cast("long").alias("n_tags"),
        F.length(h).cast("long").alias("html_len"),
        F.length(F.col(text_col)).cast("long").alias("text_len"),
        (
            F.length(F.col(text_col)).cast("double")
            / F.length(h).cast("double")
        ).alias("text_ratio"),
    )


def sitemap_entries(pages: DataFrame, xml_col: str = "sitemap_xml") -> DataFrame:
    """Parse ``<loc>`` entries out of sitemap XML strings: one row per
    entry, ``[*other cols, entry_idx, loc]`` in document order.

    Pure column algebra (regexp_extract_all + posexplode) — no XML
    library, no Python per row — which is exactly the robustness/
    throughput trade a crawl pipeline wants for the sitemap fast path
    (the strict-XML fallback belongs in a mapInPandas UDF).  Malformed
    or entry-free documents simply yield zero rows.
    """
    other = [c for c in pages.columns if c != xml_col]
    locs = F.regexp_extract_all(F.col(xml_col), F.lit("<loc>([^<]*)</loc>"), 1)
    return pages.select(*other, F.posexplode(locs).alias("entry_idx", "loc"))


def outlink_host_entropy(
    edges: DataFrame, nodes: DataFrame, *, drop_intra: bool = True
) -> DataFrame:
    """Per-host outlink diversity: Shannon entropy of each source
    host's destination-host distribution (link-weighted):
    [src_host, n_dst_hosts, total_links, h_e8_sum, entropy].

    A crawl-prioritization signal: hosts whose outlinks concentrate on
    one destination (entropy ≈ 0) are navigation/link-farm shaped;
    high-entropy hosts are hub-like. H = (Σ_d n_d·(ln T − ln n_d)) / T
    with every ln pre-rounded to an e8 BIGINT (the Adamic-Adar trick —
    raw libm sums are not engine-stable) and the final entropy a single
    IEEE division.  Built on :func:`host_edges` (the host-level
    reduction, so the entropy aggregation runs on the collapsed
    host×host table, never the url-scale edges).
    """
    he = host_edges(edges, nodes, drop_intra=drop_intra)
    tot = he.groupBy("src_host").agg(
        F.sum("n_links").cast("long").alias("total_links"),
        F.count(F.lit(1)).cast("long").alias("n_dst_hosts"),
    )
    e8ln = lambda c: F.round(F.log(c.cast("double")) * F.lit(100000000.0), 0).cast(
        "long"
    )
    terms = he.join(tot, on="src_host").select(
        "src_host",
        "total_links",
        "n_dst_hosts",
        (
            F.col("n_links").cast("long")
            * (e8ln(F.col("total_links")) - e8ln(F.col("n_links")))
        ).alias("_term"),
    )
    return terms.groupBy("src_host", "n_dst_hosts", "total_links").agg(
        F.sum("_term").cast("long").alias("h_e8_sum")
    ).select(
        "src_host",
        "n_dst_hosts",
        "total_links",
        "h_e8_sum",
        (
            F.col("h_e8_sum").cast("double")
            / (F.col("total_links").cast("double") * F.lit(100000000.0))
        ).alias("entropy"),
    )


def canonical_of(html_col: Column) -> Column:
    """``<link rel="canonical" href="...">`` target of an html string
    ('' when absent) — the dedup signal crawlers trust before any
    content hashing."""
    return F.regexp_extract(
        html_col, r'<link rel="canonical" href="([^"]*)"', 1
    )


def canonical_groups(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Canonical-URL dedup clusters from raw page HTML:
    ``[canonical_url, n_pages, keeper_id]``.

    Extracts each page's ``rel=canonical`` target and groups pages by
    it; ``keeper_id`` is the smallest member node id (parsed from the
    page url, the deterministic keeper election dedup_clusters also
    uses).  Pages without a canonical link group under their own url.
    One regexp projection + one groupBy — the html bytes never
    shuffle, only the extracted url strings do (column pruning keeps
    the scan to (url, html)).
    """
    h = F.decode(F.col(html_col), "utf-8")
    canon = F.when(canonical_of(h) != "", canonical_of(h)).otherwise(
        F.col("url")
    )
    nid = F.regexp_extract(F.col("url"), r"node(\d+)", 1).cast("long")
    return (
        pages.select(canon.alias("canonical_url"), nid.alias("_nid"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pages"),
            F.min("_nid").alias("keeper_id"),
        )
    )
