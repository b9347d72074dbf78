"""Triangle counting, transitivity, clustering coefficients.

Reference semantics:
- per-node triangle count = Σ over neighbors of ties into the neighbor
  set, halved (/root/reference/src/dachshund/algorithms/transitivity.rs:16-30);
- triples count = d(d-1)/2 (:33-36);
- transitivity = Σ per-node triangles / Σ triples (:39-47) — the
  numerator triple-counts each triangle, matching the usual 3T/wedges;
- local clustering coefficient = ties among neighbors / ordered pairs,
  ``None`` when < 2 distinct neighbors
  (/root/reference/src/dachshund/algorithms/clustering.rs:16-35) —
  equal to 2·T(v)/(d(d-1)).

Scale design: the reference probes per-node hash sets; we enumerate
each triangle exactly once with the **degree-ordered orientation**
trick (orient every edge from the lower-(degree, id) endpoint to the
higher one; every wedge then has ≤ O(m^{1/2}) fan-out even at hub
vertices), as two equi-joins over the oriented edge table.  This is the
standard shuffle-optimal distributed triangle enumeration and avoids
the d² wedge blowup at power-law hubs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.util import gcols


def _oriented_edges(graph: LinkGraph) -> DataFrame:
    """Each undirected edge once, oriented by (degree, id) rank.

    Columns: [g?, u, v, rv] with rank(u) < rank(v); ``rv`` is kept for
    the wedge-ordering filter (structs compare lexicographically).
    """
    deg = graph.degrees()
    g = gcols(graph.edges)
    can = graph.canonical_edges()
    ds = deg.select(*g, F.col("node_id").alias("src"), F.col("degree").alias("deg_src"))
    dd = deg.select(*g, F.col("node_id").alias("dst"), F.col("degree").alias("deg_dst"))
    e = can.join(ds, on=g + ["src"]).join(dd, on=g + ["dst"])
    rs = F.struct(F.col("deg_src").alias("d"), F.col("src").alias("i"))
    rd = F.struct(F.col("deg_dst").alias("d"), F.col("dst").alias("i"))
    return e.select(
        *g,
        F.when(rs < rd, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(rs < rd, F.col("dst")).otherwise(F.col("src")).alias("v"),
        F.when(rs < rd, rd).otherwise(rs).alias("rv"),
    )


def triangle_list(graph: LinkGraph, persist: bool = True) -> DataFrame:
    """All triangles, one row each: [g?, a, b, c] (orientation order).

    ``persist=False`` for callers inside iterative loops (k-truss) that
    checkpoint per superstep — persisting there would leak cache entries.
    """
    g = gcols(graph.edges)
    oe = _oriented_edges(graph)
    if persist:
        oe = oe.persist()
    w1 = oe.select(*g, "u", F.col("v").alias("x"), F.col("rv").alias("rx"))
    w2 = oe.select(*g, "u", F.col("v").alias("y"), F.col("rv").alias("ry"))
    wedges = w1.join(w2, on=g + ["u"]).where(F.col("rx") < F.col("ry"))
    closing = oe.select(*g, F.col("u").alias("x"), F.col("v").alias("y"))
    tris = wedges.join(closing, on=g + ["x", "y"]).select(
        *g, F.col("u").alias("a"), F.col("x").alias("b"), F.col("y").alias("c")
    )
    return tris


def triangle_counts(graph: LinkGraph) -> DataFrame:
    """Per-node triangle counts: [g?, node_id, triangles] (0 included)."""
    g = gcols(graph.edges)
    tris = triangle_list(graph)
    per_node = (
        tris.select(*g, F.explode(F.array("a", "b", "c")).alias("node_id"))
        .groupBy(*g, "node_id")
        .agg(F.count("*").alias("triangles"))
    )
    return (
        graph.nodes()
        .join(per_node, on=g + ["node_id"], how="left")
        .select(*g, "node_id", F.coalesce("triangles", F.lit(0)).alias("triangles"))
    )


def triples_counts(graph: LinkGraph) -> DataFrame:
    """Per-node wedge counts d(d-1)/2
    (/root/reference/src/dachshund/algorithms/transitivity.rs:33-36)."""
    g = gcols(graph.edges)
    return graph.degrees().select(
        *g,
        "node_id",
        (F.col("degree") * (F.col("degree") - 1) / 2).cast("long").alias("triples"),
    )


def transitivity(graph: LinkGraph) -> DataFrame:
    """Global transitivity per graph: 3·T / wedges.

    Counts triangles directly (one aggregation over the triangle list —
    no per-node explode, which triples the row count for nothing at
    this granularity)."""
    g = gcols(graph.edges)
    tri = (
        triangle_list(graph)
        .groupBy(*g)
        .agg((3 * F.count("*")).alias("tri3"))
    )
    trp = triples_counts(graph).groupBy(*g).agg(F.sum("triples").alias("wedges"))
    joined = trp.join(tri, on=g, how="left") if g else trp.crossJoin(tri)
    return joined.select(
        *g,
        (F.coalesce(F.col("tri3"), F.lit(0)) / F.col("wedges")).alias("transitivity"),
    )


def clustering_coefficients(graph: LinkGraph) -> DataFrame:
    """Per-node C(v) = 2·T(v)/(d(d-1)); null when d < 2
    (/root/reference/src/dachshund/algorithms/clustering.rs:22-25)."""
    g = gcols(graph.edges)
    tri = triangle_counts(graph)
    deg = graph.degrees()
    return tri.join(deg, on=g + ["node_id"]).select(
        *g,
        "node_id",
        F.when(
            F.col("degree") >= 2,
            2.0 * F.col("triangles") / (F.col("degree") * (F.col("degree") - 1)),
        ).alias("clustering"),
    )


def clustering_by_degree(graph: LinkGraph) -> DataFrame:
    """Clustering spectrum C(k): mean clustering coefficient per degree
    class — ``[graph_id?, degree, n_nodes, sum_triangles,
    mean_clustering]`` for degrees ≥ 2.

    The hierarchical-structure diagnostic (C(k) ~ k^-1 signals
    modularity; Ravasz & Barabási 2003).  Within a degree class every
    node shares the k(k−1) denominator, so the mean collapses to
    2·ΣT / (n_k·k·(k−1)) — exact integer numerator and denominator,
    ONE IEEE division per output row, no per-node float averaging.
    Cost: the triangle count join it shares with the other clustering
    stats + one histogram-sized groupBy.
    """
    g = gcols(graph.edges)
    tri = triangle_counts(graph)
    deg = graph.degrees()
    j = tri.join(deg, on=g + ["node_id"]).where(F.col("degree") >= 2)
    per = j.groupBy(*g, "degree").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum("triangles").cast("long").alias("sum_triangles"),
    )
    return per.select(
        *g,
        "degree",
        "n_nodes",
        "sum_triangles",
        (
            (F.lit(2) * F.col("sum_triangles")).cast("double")
            / (
                F.col("n_nodes")
                * F.col("degree")
                * (F.col("degree") - F.lit(1))
            )
        ).alias("mean_clustering"),
    )


def weighted_clustering(graph: LinkGraph, weight_col: str = "wt") -> DataFrame:
    """Barrat et al. (2004) weighted clustering coefficient:
    [g?, node_id, strength, wclustering].

    C_w(u) = 1/(s(u)·(deg(u)−1)) · Σ over ORDERED neighbor pairs (v,w)
    closing a triangle of (w_uv + w_uw)/2 — each triangle at u
    contributes (w_uv + w_uw) total, so uniform weights reduce C_w to
    the unweighted coefficient exactly (pinned by test).  s(u) is the
    strength (incident weight sum)
    and deg the distinct-neighbor count; null when deg < 2, matching
    the unweighted convention
    (/root/reference/src/dachshund/algorithms/clustering.rs:22-25).

    Triangles come from the degree-oriented enumeration
    (:func:`triangle_list` — O(m^1.5) shuffle-optimal); each
    triangle's three pairwise weights join back from the canonical
    weighted edge table (three equi-joins on the candidate triangles
    only, never on the full wedge set).
    """
    g = gcols(graph.edges)
    # no persist: the plan is a single DAG evaluated by one action, and
    # Spark reuses the shuffle output of the wund aggregation across its
    # three consumers (exchange reuse)
    wund = graph.weighted_undirected_edges(weight_col)
    wcanon = wund.where(F.col("src") < F.col("dst"))
    tris = triangle_list(LinkGraph(wund.select(*g, "src", "dst")))

    def pair_w(x: str, y: str, out: str) -> DataFrame:
        return wcanon.select(
            *g,
            F.col("src").alias(f"_{x}"),
            F.col("dst").alias(f"_{y}"),
            F.col(weight_col).alias(out),
        )

    # canonicalize each triangle's pairs (orientation order != id order)
    t = tris.select(
        *g,
        F.least("a", "b").alias("_ab1"), F.greatest("a", "b").alias("_ab2"),
        F.least("a", "c").alias("_ac1"), F.greatest("a", "c").alias("_ac2"),
        F.least("b", "c").alias("_bc1"), F.greatest("b", "c").alias("_bc2"),
        "a", "b", "c",
    )
    t = (
        t.join(pair_w("ab1", "ab2", "w_ab"), on=g + ["_ab1", "_ab2"])
        .join(pair_w("ac1", "ac2", "w_ac"), on=g + ["_ac1", "_ac2"])
        .join(pair_w("bc1", "bc2", "w_bc"), on=g + ["_bc1", "_bc2"])
    )
    contrib = (
        t.select(*g, F.col("a").alias("node_id"),
                 (F.col("w_ab") + F.col("w_ac")).alias("c"))
        .union(t.select(*g, F.col("b").alias("node_id"),
                        (F.col("w_ab") + F.col("w_bc")).alias("c")))
        .union(t.select(*g, F.col("c").alias("node_id"),
                        (F.col("w_ac") + F.col("w_bc")).alias("c")))
        .groupBy(*g, "node_id")
        .agg(F.sum("c").alias("tw"))
    )
    stats = wund.groupBy(*g, F.col("src").alias("node_id")).agg(
        F.sum(weight_col).alias("strength"), F.count("*").alias("degree")
    )
    return stats.join(contrib, on=g + ["node_id"], how="left").select(
        *g,
        "node_id",
        "strength",
        F.when(
            F.col("degree") >= 2,
            F.coalesce("tw", F.lit(0.0))
            / (F.col("strength") * (F.col("degree") - 1)),
        ).alias("wclustering"),
    )


def avg_clustering(graph: LinkGraph) -> DataFrame:
    """Mean over nodes with defined coefficients (null-skipping avg,
    /root/reference/src/dachshund/algorithms/clustering.rs:36-44)."""
    g = gcols(graph.edges)
    cc = clustering_coefficients(graph)
    return cc.groupBy(*g).agg(F.avg("clustering").alias("avg_clustering"))


def four_clique_list(graph: LinkGraph, persist: bool = True) -> DataFrame:
    """All 4-cliques, one row each: [g?, a, b, c, d] in orientation
    (degree, id)-rank order.

    Chiba–Nishizeki-style extension of the oriented triangle join: a
    4-clique is a triangle (a,b,c) plus a higher-ranked d adjacent to
    all three, checked with three equi-joins against the SAME oriented
    edge table (every check key is (lower, higher) rank, so the edge
    always appears in stored orientation).  Degree ordering bounds the
    per-node fan-out by the arboricity — the same hub-safety argument
    as triangle_list — and each clique is emitted exactly once.
    """
    g = gcols(graph.edges)
    oe = _oriented_edges(graph)
    if persist:
        oe = oe.persist()
    w1 = oe.select(*g, "u", F.col("v").alias("x"), F.col("rv").alias("rx"))
    w2 = oe.select(*g, "u", F.col("v").alias("y"), F.col("rv").alias("ry"))
    wedges = w1.join(w2, on=g + ["u"]).where(F.col("rx") < F.col("ry"))
    closing = oe.select(*g, F.col("u").alias("x"), F.col("v").alias("y"))
    tris = wedges.join(closing, on=g + ["x", "y"]).select(
        *g, F.col("u").alias("a"), F.col("x").alias("b"), F.col("y").alias("c")
    )
    ext = oe.select(*g, F.col("u").alias("c"), F.col("v").alias("d"))
    chk_a = oe.select(*g, F.col("u").alias("a"), F.col("v").alias("d"))
    chk_b = oe.select(*g, F.col("u").alias("b"), F.col("v").alias("d"))
    return (
        tris.join(ext, on=g + ["c"])
        .join(chk_a, on=g + ["a", "d"])
        .join(chk_b, on=g + ["b", "d"])
        .select(*g, "a", "b", "c", "d")
    )


def four_clique_counts(graph: LinkGraph) -> DataFrame:
    """Per-node 4-clique participation counts: [g?, node_id, cliques4]
    (0 included).  Counts are enumeration-order independent (a clique
    is a set), so any total order — degree rank here, id order in the
    SQL oracle — yields identical values."""
    g = gcols(graph.edges)
    quads = four_clique_list(graph)
    pn = None
    for col in ("a", "b", "c", "d"):
        part = quads.select(*g, F.col(col).alias("node_id"))
        pn = part if pn is None else pn.unionByName(part)
    counts = pn.groupBy(*g, "node_id").agg(
        F.count(F.lit(1)).cast("long").alias("cliques4")
    )
    return (
        graph.nodes()
        .join(counts, on=g + ["node_id"], how="left")
        .select(
            *g, "node_id", F.coalesce("cliques4", F.lit(0).cast("long")).alias("cliques4")
        )
    )


def kclique_counts_by_size(graph: LinkGraph, max_k: int = 6) -> DataFrame:
    """k-clique census: [g?, k, cliques] for k = 2..max_k.

    Chiba–Nishizeki extension chain over the SAME oriented edge table
    as :func:`triangle_list` / :func:`four_clique_list`: a (k+1)-clique
    is a k-clique plus a higher-ranked vertex adjacent to every member
    — one equi-join on the last member for candidates plus k−1
    adjacency-check joins, all keyed (lower, higher) rank so the edge
    is probed in stored orientation.  Degree ordering bounds fan-out by
    arboricity (hub-safe); counts are enumeration-order independent, so
    the id-ordered SQL oracle matches exactly.  Clique counting is
    inherently exponential in density — max_k caps the census, and each
    level is persisted so level k+1 never re-enumerates level k.
    """
    if max_k < 2:
        raise ValueError("max_k must be >= 2")
    g = gcols(graph.edges)
    oe = _oriented_edges(graph).persist()
    cur = oe.select(*g, F.col("u").alias("m1"), F.col("v").alias("m2"))
    # each level's count rows (one per graph per k — bounded by
    # construction) are collected eagerly so the previous level can be
    # unpersisted as soon as the next is materialized: at most two
    # levels are ever cached, instead of leaking every level's blocks
    # for the session lifetime
    spark = graph.edges.sparkSession
    rows: list = []
    schema = None
    prev = None
    k = 2
    while True:
        cur = cur.persist()
        cnt = (
            cur.groupBy(*g).agg(F.count(F.lit(1)).alias("cliques")).select(
                *g, F.lit(k).cast("long").alias("k"), "cliques"
            )
            if g
            else cur.agg(F.count(F.lit(1)).alias("cliques")).select(
                F.lit(k).cast("long").alias("k"), "cliques"
            )
        )
        if schema is None:
            schema = cnt.schema
        lvl_rows = cnt.collect()  # materializes this level's cache
        rows.extend(lvl_rows)
        if prev is not None:
            prev.unpersist()
        # early stop: an empty level means every higher level is empty
        # too (cliques nest downward) — emit the remaining zero rows
        # (single-graph frames; multi-graph output simply omits absent
        # (graph, k) combos, same as enumerating would)
        drained = (not lvl_rows) if g else (lvl_rows[0]["cliques"] == 0)
        if k == max_k or drained:
            cur.unpersist()
            if not g:
                for k2 in range(k + 1, max_k + 1):
                    rows.append((k2, 0))
            break
        ext = oe.select(*g, F.col("u").alias(f"m{k}"), F.col("v").alias(f"m{k+1}"))
        nxt = cur.join(ext, on=g + [f"m{k}"])
        for i in range(1, k):
            chk = oe.select(
                *g, F.col("u").alias(f"m{i}"), F.col("v").alias(f"m{k+1}")
            )
            nxt = nxt.join(chk, on=g + [f"m{i}", f"m{k+1}"])
        prev = cur
        cur = nxt.select(*g, *[f"m{i}" for i in range(1, k + 2)])
        k += 1
    oe.unpersist()
    return spark.createDataFrame(rows, schema)


def maximal_clique_counts(graph: LinkGraph, max_k: int = 6) -> DataFrame:
    """Maximal-clique census: [g?, k, maximal_cliques] for k = 2..max_k.

    A k-clique is non-maximal iff it is a drop-one subset of some
    (k+1)-clique — and every drop-one subset of a (k+1)-clique IS a
    k-clique, so maximal_k = |L_k| − |distinct drop-one subsets of
    L_{k+1}|: pure set algebra over the census levels, no anti-join.
    Levels are enumerated to max_k+1 so the top reported size is judged
    against real evidence.  Counts are order-independent (maximality is
    a set property), so the id-ordered SQL oracle matches the
    degree-rank Spark enumeration.
    """
    if max_k < 2:
        raise ValueError("max_k must be >= 2")
    g = gcols(graph.edges)
    spark = graph.edges.sparkSession
    oe = _oriented_edges(graph).persist()
    cur = oe.select(*g, F.col("u").alias("m1"), F.col("v").alias("m2"))
    # per-level totals and drop-one-subset counts are collected eagerly
    # (one row per graph per level — bounded by construction) so each
    # level is unpersisted as soon as the next is materialized: at most
    # two levels cached at once, no session-lifetime cache leak
    totals: dict = {}
    nonmax: dict = {}
    prev = None
    for k in range(2, max_k + 2):
        cur = cur.persist()
        tot = (
            cur.groupBy(*g).agg(F.count(F.lit(1)).alias("_t"))
            if g
            else cur.agg(F.count(F.lit(1)).alias("_t"))
        )
        for r in tot.collect():  # materializes this level's cache
            totals[(tuple(r[c] for c in g), k)] = int(r["_t"])
        if k >= 3:
            cols = [f"m{i}" for i in range(1, k + 1)]
            subs = None
            for drop in cols:
                keep = [c for c in cols if c != drop]
                part = cur.select(
                    *g, *[F.col(c).alias(f"m{i+1}") for i, c in enumerate(keep)]
                )
                subs = part if subs is None else subs.union(part)
            subs = subs.distinct()
            nm = (
                subs.groupBy(*g).agg(F.count(F.lit(1)).alias("_n"))
                if g
                else subs.agg(F.count(F.lit(1)).alias("_n"))
            )
            for r in nm.collect():
                nonmax[(tuple(r[c] for c in g), k - 1)] = int(r["_n"])
        if prev is not None:
            prev.unpersist()
        if k == max_k + 1:
            cur.unpersist()
            break
        ext = oe.select(*g, F.col("u").alias(f"m{k}"), F.col("v").alias(f"m{k+1}"))
        nxt = cur.join(ext, on=g + [f"m{k}"])
        for i in range(1, k):
            chk = oe.select(
                *g, F.col("u").alias(f"m{i}"), F.col("v").alias(f"m{k+1}")
            )
            nxt = nxt.join(chk, on=g + [f"m{i}", f"m{k+1}"])
        prev = cur
        cur = nxt.select(*g, *[f"m{i}" for i in range(1, k + 2)])
    oe.unpersist()

    from pyspark.sql import types as T

    gfields = [f for f in graph.edges.schema.fields if f.name in g]
    schema = T.StructType(
        gfields
        + [
            T.StructField("k", T.LongType(), False),
            T.StructField("maximal_cliques", T.LongType(), False),
        ]
    )
    rows = [
        tuple(gkey) + (k, t - nonmax.get((gkey, k), 0))
        for (gkey, k), t in sorted(totals.items(), key=lambda kv: kv[0][1])
        if k <= max_k
    ]
    return spark.createDataFrame(rows, schema)


def edge_clustering(graph: LinkGraph, topk: int | None = None) -> DataFrame:
    """Radicchi edge clustering coefficient per canonical edge.

    C3(e=(u,v)) = (T(e) + 1) / (min(d_u, d_v) - 1)  — the fraction of
    *possible* triangles through the edge that actually exist (Radicchi
    et al. 2004, "Defining and identifying communities in networks").
    Low-C3 edges are inter-community; the reference's trim/prune layer
    (/root/reference/src/dachshund/graph_base.rs degree filters) keeps
    nodes, this keeps informative *edges* — the sparsifier's dual.

    Engine-exact output: ``score_e9 = (T+1)·10^9 DIV (min(d)-1)``
    (integer truncating division, identical in Spark ``DIV`` and DuckDB
    ``//``), so ordering and values reproduce bit-for-bit in any SQL
    engine.  Edges with min degree < 2 are excluded (denominator 0).

    Scale shape: triangle supports come from the degree-oriented
    triangle listing (O(m^1.5) shuffle-optimal), one groupBy over the
    3·T pair rows, then a join back to the canonical edge table — no
    per-node wedge blowup at hubs.
    """
    g = gcols(graph.edges)
    tris = triangle_list(graph)
    pairs = None
    for x, y in (("a", "b"), ("a", "c"), ("b", "c")):
        p = tris.select(
            *g,
            F.least(F.col(x), F.col(y)).alias("src"),
            F.greatest(F.col(x), F.col(y)).alias("dst"),
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    sup = pairs.groupBy(*g, "src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )
    deg = graph.degrees()
    du = deg.select(*g, F.col("node_id").alias("src"), F.col("degree").alias("d_src"))
    dv = deg.select(*g, F.col("node_id").alias("dst"), F.col("degree").alias("d_dst"))
    out = (
        graph.canonical_edges()
        .join(sup, on=g + ["src", "dst"], how="left")
        .join(du, on=g + ["src"])
        .join(dv, on=g + ["dst"])
        .withColumn("support", F.coalesce(F.col("support"), F.lit(0)).cast("long"))
        .withColumn("min_deg", F.least("d_src", "d_dst").cast("long"))
        .where(F.col("min_deg") >= 2)
        .select(
            *g,
            "src",
            "dst",
            "support",
            F.expr("(support + 1) * 1000000000 DIV (min_deg - 1)")
            .cast("long")
            .alias("score_e9"),
        )
    )
    if topk is not None:
        out = out.orderBy(F.desc("score_e9"), "src", "dst").limit(int(topk))
    return out


def signed_triangle_balance(graph: LinkGraph, signs: DataFrame | None = None) -> DataFrame:
    """Structural-balance census over a signed graph (Cartwright–Harary).

    A triangle is *balanced* iff the product of its three edge signs is
    +1 (friend-of-friend consistency).  ``signs`` is a canonical-edge
    table ``[src < dst, sign ∈ {+1,-1}]``; when omitted, a deterministic
    md5-parity sign is derived per canonical edge (the seeded-synthetic
    convention used by rewire/percolation so the DuckDB oracle replays
    the exact same signs).

    Output: one row — n_triangles, n_balanced, n_unbalanced, and
    frac_balanced as a single IEEE division of exact integers.

    Scale shape: the triangle listing is the only superlinear step
    (O(m^1.5)); the three sign joins are equi-joins on canonical pairs.
    """
    from dachshund_spark.pipeline.text import md5_long

    g = gcols(graph.edges)
    can = graph.canonical_edges()
    if signs is None:
        signs = can.select(
            *g,
            "src",
            "dst",
            F.when(
                F.pmod(
                    md5_long(
                        F.concat_ws(
                            "#", F.col("src").cast("string"), F.col("dst").cast("string")
                        )
                    ),
                    F.lit(2),
                )
                == 0,
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .alias("sign"),
        )
    tris = triangle_list(graph)
    t = tris.select(
        *g,
        F.least("a", "b").alias("p1s"),
        F.greatest("a", "b").alias("p1d"),
        F.least("a", "c").alias("p2s"),
        F.greatest("a", "c").alias("p2d"),
        F.least("b", "c").alias("p3s"),
        F.greatest("b", "c").alias("p3d"),
    )

    gs = [c for c in g if c in signs.columns]

    def sj(df: DataFrame, i: int) -> DataFrame:
        s = signs.select(
            *gs,
            F.col("src").alias(f"p{i}s"),
            F.col("dst").alias(f"p{i}d"),
            F.col("sign").alias(f"s{i}"),
        )
        return df.join(s, on=gs + [f"p{i}s", f"p{i}d"])

    t = sj(sj(sj(t, 1), 2), 3).withColumn(
        "prod", F.col("s1") * F.col("s2") * F.col("s3")
    )
    agg = [
        F.count(F.lit(1)).cast("long").alias("n_triangles"),
        F.sum(F.when(F.col("prod") == 1, 1).otherwise(0)).cast("long").alias("n_balanced"),
        F.sum(F.when(F.col("prod") == -1, 1).otherwise(0)).cast("long").alias("n_unbalanced"),
    ]
    out = t.groupBy(*g).agg(*agg) if g else t.agg(*agg)
    return out.withColumn(
        "frac_balanced",
        F.expr("CAST(n_balanced AS DOUBLE) / nullif(n_triangles, 0)"),
    )
