"""Deterministic synthetic pages corpus embedding a known link graph.

Produces the `input_hint` table
``pages(url: string, warc_ts: timestamp, html: binary, text: string,
lang: string)`` entirely with JVM-side column expressions from an edge
DataFrame (no driver-side page building): one page per node whose
``<a href>`` links encode exactly its out-edges, so
``pages → extractor → edges`` is fully checkable and the stored
``text`` column is byte-identical to the pinned extractor's output by
construction (both are generated from the same template rules).

Seeded; power-law graphs come from LinkGraph.powerlaw_graph (hub skew
per FIXTURES.md §1/§5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph

URL_PREFIX = "https://node"
URL_SUFFIX = ".example.com"


def node_url(node_col) -> "F.Column":
    return F.concat(F.lit(URL_PREFIX), node_col.cast("string"), F.lit(URL_SUFFIX))


def generate_pages(graph: LinkGraph, seed: int = 42) -> DataFrame:
    """One page per node of the (directed) graph.

    html layout per page (node k with out-neighbors d1 < d2 < …)::

        <html><head><title>Node k</title>
        <script>var x = "ignored-k";</script></head>
        <body><h1>Page k</h1><p>Synthetic page k of the corpus &amp; friends.</p>
        <a href="https://nodeD1.example.com">link D1</a>… </body></html>

    text (pinned extractor v1 output) = title + headings + paragraph +
    anchor texts, whitespace-collapsed.
    """
    e = graph.edges
    out = (
        e.groupBy(F.col("src").alias("node_id"))
        .agg(F.sort_array(F.collect_set("dst")).alias("dsts"))
    )
    all_nodes = graph.nodes().join(out, on="node_id", how="left").select(
        "node_id", F.coalesce("dsts", F.array().cast("array<long>")).alias("dsts")
    )
    k = F.col("node_id").cast("string")
    anchors_html = F.concat_ws(
        "",
        F.transform(
            F.col("dsts"),
            lambda d: F.concat(
                F.lit('<a href="'),
                node_url(d),
                F.lit('">link '),
                d.cast("string"),
                F.lit("</a>"),
            ),
        ),
    )
    anchors_text = F.concat_ws(
        " ",
        F.transform(F.col("dsts"), lambda d: F.concat(F.lit("link "), d.cast("string"))),
    )
    html = F.concat(
        F.lit("<html><head><title>Node "), k, F.lit("</title>"),
        F.lit('<script>var x = "ignored-'), k, F.lit('";</script>'),
        F.lit("<style>body { color: #000; }</style></head>"),
        F.lit("<body><h1>Page "), k, F.lit("</h1>"),
        F.lit("<p>Synthetic page "), k, F.lit(" of the corpus &amp; friends.</p>"),
        anchors_html,
        F.lit("</body></html>"),
    )
    text = F.when(
        F.size("dsts") > 0,
        F.concat(
            F.lit("Node "), k, F.lit(" Page "), k,
            F.lit(" Synthetic page "), k, F.lit(" of the corpus & friends. "),
            anchors_text,
        ),
    ).otherwise(
        F.concat(
            F.lit("Node "), k, F.lit(" Page "), k,
            F.lit(" Synthetic page "), k, F.lit(" of the corpus & friends."),
        )
    )
    warc_ts = F.to_timestamp(
        F.from_unixtime(F.lit(1_600_000_000) + F.pmod(F.col("node_id") * 37 + seed, 10_000_000))
    )
    return all_nodes.select(
        node_url(F.col("node_id")).alias("url"),
        warc_ts.alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        text.alias("text"),
        F.lit("en").alias("lang"),
    )
