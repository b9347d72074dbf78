"""Bipartite butterfly (4-cycle) counting over the directed link graph.

A *butterfly* is the bipartite analogue of a triangle: two sources
``s1 < s2`` both linking to two destinations ``d1 < d2`` (a complete
2x2 biclique).  On web link graphs, dense butterfly concentrations are
the classic link-farm / mutual-admiration-society signature (two spam
hosts cross-linking the same target sets), and the butterfly count is
the base motif for bipartite clustering coefficients.

Counting strategy (Wang et al., "Vertex Priority Based Butterfly
Counting", VLDB 2019 — the wedge-aggregation formulation): group the
wedge pairs through the shared endpoint, then per leaf pair ``(u, v)``
with ``k`` shared centers the pair closes ``C(k, 2)`` butterflies.
This reuses the co-citation / bibliographic-coupling wedge join
(``linkpred._directed_wedge_pairs``): one self-join on the center
endpoint + one count — never an all-pairs product, and the
``max_center_degree`` cap bounds the quadratic hub fan-out exactly as
in link prediction (a 10^6-out-degree directory page would otherwise
emit 10^12 wedges).

Reference parity: the reference engine has no bipartite motifs; this is
an engine addition for the web-scale tier (SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.util import gcols
from dachshund_spark.algorithms.linkpred import _directed_wedge_pairs

__all__ = ["butterfly_counts", "butterfly_total"]


def _pair_butterflies(pairs: DataFrame, g: list[str]) -> DataFrame:
    """[g?, u, v, weight>=2, bf = C(weight, 2)] — pairs closing >=1
    butterfly.  ``weight * (weight - 1) DIV 2`` stays in exact integer
    arithmetic (ANSI-safe: weight is bounded by the center-degree cap,
    far below sqrt(2^63))."""
    return pairs.where(F.col("weight") >= 2).withColumn(
        "bf", F.expr("CAST(weight * (weight - 1) DIV 2 AS BIGINT)")
    )


def butterfly_counts(
    graph: LinkGraph,
    *,
    side: str = "dst",
    max_center_degree: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """Per-node butterfly participation counts: ``[graph_id?, node_id,
    butterflies]`` for every node on ``side`` that closes at least one
    butterfly.

    ``side='dst'`` counts over destination pairs sharing co-citing
    sources (wedge center = ``src``); ``side='src'`` is the dual
    (shared out-link targets).  A node's count is the sum of
    ``C(k, 2)`` over its leaf pairs — each butterfly is credited to
    both of its ``side``-layer endpoints, so the global total is half
    the column sum (see :func:`butterfly_total`).
    """
    if side not in ("src", "dst"):
        raise ValueError(f"side must be 'src' or 'dst', got {side!r}")
    center, leaf = ("src", "dst") if side == "dst" else ("dst", "src")
    g = gcols(graph.edges)
    pairs = _pair_butterflies(
        _directed_wedge_pairs(
            graph.edges, g, center, leaf, max_center_degree, persist
        ),
        g,
    )
    ends = pairs.select(*g, F.col("u").alias("node_id"), "bf").unionByName(
        pairs.select(*g, F.col("v").alias("node_id"), "bf")
    )
    return ends.groupBy(*g, "node_id").agg(
        F.sum("bf").cast("long").alias("butterflies")
    )


def butterfly_total(
    graph: LinkGraph,
    *,
    max_center_degree: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """Single-row (per graph) global motif summary: ``[graph_id?,
    butterflies, wedge_pairs]`` where ``wedge_pairs`` is the number of
    destination pairs with >=1 shared source (the bipartite analogue of
    the triple count feeding a bipartite clustering coefficient)."""
    g = gcols(graph.edges)
    pairs = _directed_wedge_pairs(
        graph.edges, g, "src", "dst", max_center_degree, persist
    )
    agg = pairs.groupBy(*g).agg(
        F.sum(F.expr("CAST(weight * (weight - 1) DIV 2 AS BIGINT)"))
        .cast("long")
        .alias("butterflies"),
        F.count(F.lit(1)).cast("long").alias("wedge_pairs"),
    )
    return agg


def bipartite_projection(
    memberships: DataFrame,
    *,
    group_col: str,
    item_col: str,
    max_group_size: int | None = 64,
) -> DataFrame:
    """Weighted one-mode projection of a (group, item) membership table:
    ``[item_a, item_b, weight]`` with ``item_a < item_b`` and weight =
    number of shared groups (the market-basket / co-purchase graph).

    Scale shape: one distinct pass, an optional per-group fan-out gate,
    then a self-join on the group key — each group of size s emits
    s·(s−1)/2 pairs, so ``max_group_size`` caps the quadratic hub
    blow-up (a million-item catalog order would otherwise emit 10¹²
    pairs); dropped groups are whole-group drops, never partial, so the
    weights stay exact for every retained group.
    """
    m = memberships.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("item")
    ).distinct()
    if max_group_size is not None:
        sizes = m.groupBy("g").agg(F.count(F.lit(1)).alias("_s"))
        m = m.join(
            sizes.where(F.col("_s") <= int(max_group_size)).select("g"), on="g"
        )
    a = m.select("g", F.col("item").alias("item_a"))
    b = m.select("g", F.col("item").alias("item_b"))
    return (
        a.join(b, on="g")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def association_rules(
    memberships: DataFrame,
    *,
    group_col: str,
    item_col: str,
    max_group_size: int | None = 64,
    min_weight: int = 2,
) -> DataFrame:
    """Directed association rules a→b from the co-occurrence projection:
    ``[item_a, item_b, weight, n_a, n_b, confidence, lift]``.

    confidence = P(b | a) = weight / n_a;
    lift = P(a,b) / (P(a)·P(b)) = N·weight / (n_a·n_b), with N = number
    of retained groups.  Both are single IEEE divisions of exact
    integers (engine-stable); support counts use the SAME whole-group
    fan-out gate as :func:`bipartite_projection`, so weights and
    marginals stay consistent.  Emitted in both directions (a→b, b→a).
    """
    m = memberships.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("item")
    ).distinct()
    if max_group_size is not None:
        sizes = m.groupBy("g").agg(F.count(F.lit(1)).alias("_s"))
        m = m.join(
            sizes.where(F.col("_s") <= int(max_group_size)).select("g"), on="g"
        ).persist()
    n_groups = m.select("g").distinct().count()
    pair = (
        m.select("g", F.col("item").alias("item_a"))
        .join(m.select("g", F.col("item").alias("item_b")), on="g")
        .where(F.col("item_a") != F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("weight"))
        .where(F.col("weight") >= int(min_weight))
    )
    marg = m.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    out = (
        pair.join(
            marg.select(F.col("item").alias("item_a"), F.col("n").alias("n_a")),
            on="item_a",
        )
        .join(
            marg.select(F.col("item").alias("item_b"), F.col("n").alias("n_b")),
            on="item_b",
        )
    )
    w, na, nb = F.col("weight"), F.col("n_a"), F.col("n_b")
    return out.select(
        "item_a",
        "item_b",
        w.cast("long").alias("weight"),
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        (w.cast("double") / na.cast("double")).alias("confidence"),
        (
            (F.lit(int(n_groups)) * w).cast("double")
            / (na * nb).cast("double")
        ).alias("lift"),
    )
