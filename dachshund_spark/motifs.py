"""GraphFrames-style motif finding over the edge table.

``find(graph, "(a)-[e]->(b); (b)-[]->(c); !(a)-[]->(c)")`` returns one
row per binding of the named vertices (long node-id columns) and named
edges (struct columns), built as a chain of DataFrame joins — exactly
the execution strategy GraphFrames lowers motifs to, so Catalyst
reorders/broadcasts the joins and the whole pattern stays JVM-side.

Grammar (a subset of GraphFrames'):
- term: ``(a)-[e]->(b)`` — directed edge from vertex ``a`` to ``b``,
  optionally binding the edge as ``e``
- anonymous vertices/edges: ``()`` / ``[]`` bind nothing
- negated term: ``!(a)-[]->(b)`` — no edge a→b may exist; may only
  reference vertices bound by positive terms (GraphFrames' rule), and
  cannot bind an edge name
- terms separated by ``;``

Distinct vertex names are NOT forced to distinct nodes (GraphFrames
semantics); filter afterwards (e.g. ``.where("a != c")``) if needed.
Multi-graph frames match within each graph_id.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.util import gcols

_TERM = re.compile(r"^(!?)\((\w*)\)-\[(\w*)\]->\((\w*)\)$")


def _parse(pattern: str) -> list[tuple[bool, str, str, str]]:
    terms = []
    anon = 0
    for raw in pattern.split(";"):
        raw = raw.strip()
        if not raw:
            continue
        m = _TERM.match(raw)
        if not m:
            raise ValueError(f"unparseable motif term: {raw!r}")
        neg, va, e, vb = m.group(1) == "!", m.group(2), m.group(3), m.group(4)
        if neg and e:
            raise ValueError(f"negated term cannot bind an edge: {raw!r}")
        if not va:
            va, anon = f"__v{anon}", anon + 1
        if not vb:
            vb, anon = f"__v{anon}", anon + 1
        terms.append((neg, va, e, vb))
    if not terms:
        raise ValueError("empty motif pattern")
    return terms


def find(graph: LinkGraph, pattern: str) -> DataFrame:
    """One row per motif match; columns = graph_id? + named vertices
    (long) + named edges (struct<src,dst>)."""
    edges = graph.edges.distinct()
    g = gcols(edges)
    terms = _parse(pattern)

    result: DataFrame | None = None
    bound: set[str] = set()
    bound_edges: set[str] = set()
    negated: list[tuple[str, str]] = []
    for neg, va, e, vb in terms:
        if neg:
            negated.append((va, vb))
            continue
        if e:
            # an edge name may bind only one term — a reuse like
            # "(a)-[e]->(b); (b)-[e]->(c)" would produce two columns
            # both named e and fail later with an opaque
            # ambiguous-reference error (GraphFrames rejects this too)
            if e in bound_edges:
                raise ValueError(f"edge name {e!r} is bound by more than one term")
            bound_edges.add(e)
        if va == vb:
            # (a)-[]->(a): a self-loop constraint — one output column,
            # not two identically-named aliases
            t = edges.where(F.col("src") == F.col("dst"))
            cols = [F.col("src").alias(va)]
        else:
            t = edges
            cols = [F.col("src").alias(va), F.col("dst").alias(vb)]
        if e:
            cols.append(F.struct("src", "dst").alias(e))
        t = t.select(*g, *cols)
        if result is None:
            result = t
        else:
            common = g + sorted(bound & {va, vb})
            result = (
                result.join(t, on=common) if common else result.crossJoin(t)
            )
        bound |= {va, vb}

    if result is None:
        raise ValueError("motif pattern needs at least one positive term")
    for va, vb in negated:
        missing = {va, vb} - bound
        if missing:
            raise ValueError(
                f"negated term references unbound vertices: {sorted(missing)}"
            )
        if va == vb:
            absent = edges.where(F.col("src") == F.col("dst")).select(
                *g, F.col("src").alias(va)
            )
            result = result.join(absent, on=g + [va], how="left_anti")
        else:
            absent = edges.select(*g, F.col("src").alias(va), F.col("dst").alias(vb))
            result = result.join(absent, on=g + [va, vb], how="left_anti")

    public = g + [c for c in result.columns if not c.startswith("__") and c not in g]
    return result.select(*public)


def graphlet_census(graph: LinkGraph) -> DataFrame:
    """Exact NON-INDUCED undirected graphlet counts:
    ``[g?, motif, count]`` for wedge, triangle, claw (S4), path4 (P4),
    cycle4 (C4), diamond (K4−e), clique4 (K4).

    Every count is a closed-form integer combination of four cheap
    aggregates — degrees, triangle list, per-edge triangle support, and
    codegree pairs — so nothing here enumerates 4-tuples except the K4
    join itself:

    - wedge      = Σ_v C(d_v, 2)
    - claw       = Σ_v C(d_v, 3)
    - path4      = Σ_{(u,v)∈E} (d_u−1)(d_v−1) − 3·triangle
      (each 3-edge path counted once at its central edge; the 3
      degenerate closed walks per triangle subtracted)
    - cycle4     = Σ_{u<w} C(codeg(u,w), 2) / 2
      (each C4 has two vertex-disjoint diagonal pairs)
    - diamond    = Σ_{e∈E} C(sup_e, 2)
      (pairs of triangles sharing edge e; sup_e = triangle support)
    - clique4    = the Chiba–Nishizeki K4 join

    The codegree pair table is the same O(Σd²) wedge self-join as
    triangle counting — hub-cap it upstream on skewed graphs.
    """
    from dachshund_spark.algorithms.triangles import (
        four_clique_list,
        triangle_list,
    )
    from dachshund_spark.util import gcols

    g = gcols(graph.edges)
    und = graph.undirected_edges().persist()
    canon = und.where(F.col("src") < F.col("dst")).persist()
    deg = und.groupBy(*g, F.col("src").alias("node_id")).agg(
        F.count(F.lit(1)).alias("d")
    )

    def gagg(df, expr, name):
        return (
            df.groupBy(*g).agg(expr.alias(name))
            if g
            else df.agg(expr.alias(name))
        )

    d = F.col("d")
    wedges = gagg(deg, F.expr("sum(d * (d - 1)) DIV 2").cast("long"), "n")
    claws = gagg(
        deg, F.expr("sum(d * (d - 1) * (d - 2)) DIV 6").cast("long"), "n"
    )

    tris = triangle_list(graph)
    n_tri = gagg(tris, F.count(F.lit(1)).cast("long"), "n")

    # central-edge path count: join canon edges with endpoint degrees
    ds = deg.select(*g, F.col("node_id").alias("src"), d.alias("d_src"))
    dd = deg.select(*g, F.col("node_id").alias("dst"), d.alias("d_dst"))
    ej = canon.join(ds, on=g + ["src"]).join(dd, on=g + ["dst"])
    paths_raw = gagg(
        ej, F.sum((F.col("d_src") - 1) * (F.col("d_dst") - 1)).cast("long"), "n"
    )

    # codegree pairs (u < w sharing ≥2 common neighbors)
    w1 = und.select(*g, F.col("src").alias("x"), F.col("dst").alias("u"))
    w2 = und.select(*g, F.col("src").alias("x"), F.col("dst").alias("w"))
    codeg = (
        w1.join(w2, on=g + ["x"])
        .where(F.col("u") < F.col("w"))
        .groupBy(*g, "u", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    c = F.col("c")
    cycles4 = gagg(
        codeg, F.expr("(sum(c * (c - 1)) DIV 2) DIV 2").cast("long"), "n"
    )

    # per-edge triangle support: each triangle credits its 3 edges
    sup = (
        tris.select(
            *g,
            F.explode(
                F.array(
                    F.struct(
                        F.least("a", "b").alias("es"), F.greatest("a", "b").alias("ed")
                    ),
                    F.struct(
                        F.least("a", "c").alias("es"), F.greatest("a", "c").alias("ed")
                    ),
                    F.struct(
                        F.least("b", "c").alias("es"), F.greatest("b", "c").alias("ed")
                    ),
                )
            ).alias("e"),
        )
        .select(*g, "e.es", "e.ed")
        .groupBy(*g, "es", "ed")
        .agg(F.count(F.lit(1)).alias("s"))
    )
    s = F.col("s")
    diamonds = gagg(sup, F.expr("sum(s * (s - 1)) DIV 2").cast("long"), "n")

    k4 = gagg(four_clique_list(graph), F.count(F.lit(1)).cast("long"), "n")

    def tag(df, motif, extra=None):
        n = F.col("n") if extra is None else extra
        return df.select(*g, F.lit(motif).alias("motif"), n.cast("long").alias("count"))

    out = tag(wedges, "wedge")
    out = out.unionByName(tag(n_tri, "triangle"))
    out = out.unionByName(tag(claws, "claw"))
    # subtract 3·triangles from the raw central-edge path count
    if g:
        pj = paths_raw.withColumnRenamed("n", "praw").join(
            n_tri.withColumnRenamed("n", "t"), on=g, how="left"
        )
    else:
        pj = paths_raw.withColumnRenamed("n", "praw").withColumn(
            "_j", F.lit(1)
        ).join(
            F.broadcast(
                n_tri.withColumnRenamed("n", "t").withColumn("_j", F.lit(1))
            ),
            on="_j",
        )
    out = out.unionByName(
        tag(pj, "path4", F.col("praw") - 3 * F.coalesce("t", F.lit(0)))
    )
    out = out.unionByName(tag(cycles4, "cycle4"))
    out = out.unionByName(tag(diamonds, "diamond"))
    out = out.unionByName(tag(k4, "clique4"))
    return out
