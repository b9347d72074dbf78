"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

GRAPH_ID = "graph_id"


def hinted(df: DataFrame, join_hint: str | None) -> DataFrame:
    """Apply an explicit join-side strategy for superstep joins.

    - None ("auto"): let Catalyst/AQE pick — right default for
      correctness runs.
    - "broadcast": small-state graphs (state ≪ executor memory); kills
      the per-superstep sort/shuffle entirely.
    - "shuffle_hash": web-scale states that don't fit a broadcast —
      hash join against pre-partitioned edges without sorting the big
      side every superstep.
    """
    if join_hint == "broadcast":
        return F.broadcast(df)
    if join_hint == "shuffle_hash":
        return df.hint("shuffle_hash")
    return df


def gcols(df: DataFrame) -> list[str]:
    """Grouping prefix: [`graph_id`] when the frame is multi-graph.

    The reference processes one graph per batch keyed by graph_id
    (/root/reference/src/dachshund/transformer_base.rs:58-77); we keep
    the key as an ordinary column so every join/agg is per-graph when
    present and zero-overhead when absent (single web graph).
    """
    return [GRAPH_ID] if GRAPH_ID in df.columns else []


def two_phase_rank_by(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    out_col: str = "rank",
    n_buckets: int = 1024,
) -> DataFrame:
    """Global ``row_number`` ordered by ``(value_col, tiebreak_col)``
    ascending, WITHOUT a single-partition window — the generic twin of
    components._two_phase_rank / packing._two_phase_cumsum.

    Phase 1: order-consistent ``width_bucket`` over the value range
    (monotone, so bucket order == value order; numeric→double collision
    ties stay inside one bucket), per-bucket ``row_number`` over
    ``(value, tiebreak)``.  Phase 2: per-bucket counts (≤ n_buckets+2
    rows) come to the driver, cumulative offsets broadcast back.
    Ranks are 1-based and total (ties broken by ``tiebreak_col``).
    """
    lo, hi = df.agg(F.min(value_col), F.max(value_col)).first()
    if lo is None:
        return df.withColumn(out_col, F.lit(0).cast("long"))
    if lo == hi:
        bucket_col = F.lit(1).cast("long")
    else:
        bucket_col = F.width_bucket(
            F.col(value_col).cast("double"),
            F.lit(float(lo)),
            F.lit(float(hi)),
            F.lit(n_buckets),
        )
    from pyspark.sql import Window

    b = df.withColumn("_bucket", bucket_col)
    w = Window.partitionBy("_bucket").orderBy(value_col, tiebreak_col)
    b = b.withColumn("_lr", F.row_number().over(w))
    counts = sorted(
        (r["_bucket"], r["cnt"])
        for r in b.groupBy("_bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for bucket, cnt in counts:
        offsets.append((int(bucket), int(acc)))
        acc += int(cnt)
    off_df = df.sparkSession.createDataFrame(offsets, "_bucket long, _offset long")
    return (
        b.join(F.broadcast(off_df), on="_bucket")
        .withColumn(out_col, (F.col("_offset") + F.col("_lr")).cast("long"))
        .drop("_bucket", "_lr", "_offset")
    )
