"""Mergeable frequency sketches: Count–Min over corpus tokens.

Cormode & Muthukrishnan 2005: a depth×width grid of counters; item x
increments cell (i, h_i(x)) per row i, and its estimate is the MIN
over rows — always ≥ the true count (one-sided error ≤ εN with
ε ≈ e/width at failure probability e^-depth).

Why a sketch engine-side: the CMS table is *additive* — per-partition
grids sum cell-wise, so it map-side combines in one shuffle of
depth·width cells regardless of corpus size, and grids from separate
corpus shards / streaming micro-batches merge by addition (the same
mergeability contract as the HLL sketches in
:func:`dachshund_spark.graph.LinkGraph.approx_degrees`).  The
engine's heavy-hitter path over 100 TB of text is: CMS per shard →
cell-wise sum → probe candidate tokens.

Hashes are md5-derived (`md5_long(token || '#cms' || row)`), so the
oracle SQL reproduces the grid bit-for-bit — estimates are exact
integers, no float anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.pipeline.text import md5_long, tokens


def _bucket(col, row: int, width: int):
    return md5_long(F.concat(col, F.lit(f"#cms{row}"))) % F.lit(int(width))


def cms_build(
    docs: DataFrame,
    depth: int = 4,
    width: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """Count–Min grid ``[row, bucket, cnt]`` over the corpus tokens
    (one explode; the depth hashes are projected map-side so the
    shuffle carries at most depth·width cells after partial agg)."""
    if depth < 1 or width < 2:
        raise ValueError("depth must be >= 1 and width >= 2")
    toks = docs.select(F.explode(tokens(text_col)).alias("token"))
    rows = [
        toks.select(
            F.lit(i).alias("row"), _bucket(F.col("token"), i, width).alias("bucket")
        )
        for i in range(depth)
    ]
    grid = rows[0]
    for r in rows[1:]:
        grid = grid.unionByName(r)
    return grid.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def cms_merge(*grids: DataFrame) -> DataFrame:
    """Cell-wise sum of CMS grids built with the same (depth, width) —
    the shard/stream merge operation."""
    if not grids:
        raise ValueError("need at least one grid")
    out = grids[0]
    for g in grids[1:]:
        out = out.unionByName(g)
    return out.groupBy("row", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cms_estimate(
    grid: DataFrame,
    probes: DataFrame,
    depth: int = 4,
    width: int = 256,
    token_col: str = "token",
) -> DataFrame:
    """Point estimates ``[token, cms_estimate]`` for the probe tokens:
    min over rows of the matching cells.  The probe side is exploded
    to (token, row, bucket) and hash-joined against the grid — the
    grid is depth·width rows, so Catalyst broadcasts it."""
    keyed = probes.select(token_col).distinct()
    lookups = [
        keyed.select(
            token_col,
            F.lit(i).alias("row"),
            _bucket(F.col(token_col), i, width).alias("bucket"),
        )
        for i in range(depth)
    ]
    probe = lookups[0]
    for l in lookups[1:]:
        probe = probe.unionByName(l)
    return (
        probe.join(F.broadcast(grid), on=["row", "bucket"])
        .groupBy(token_col)
        .agg(F.min("cnt").cast("long").alias("cms_estimate"))
    )
