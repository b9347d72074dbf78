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
