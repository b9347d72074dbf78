"""Sequence packing: the concat-and-chunk manifest for LLM training.

Training pipelines concatenate the token streams of consecutive
documents and slice the result into fixed-capacity sequences (the
GPT-style "packing" that keeps every context window full).  This
module computes the *manifest* — which token span of which document
lands in which training sequence — as pure column algebra, so the
actual packing job is a manifest join + per-sequence gather.

Scale: the only global structure is a cumulative token-count sum in
doc_id order.  A naive ``Window.orderBy(doc_id)`` funnels the whole
corpus through one task (the CC-renumber scale-killer from VERDICT
r2), so the cumsum is two-phase: order-preserving ``width_bucket``
range bucketing → per-bucket window cumsum (independent partitions) →
per-bucket totals to the driver (≤ n_buckets rows) → cumulative
offsets broadcast back.  Exact, deterministic, no single-partition
stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dachshund_spark.pipeline.text import tokens

_PACK_BUCKETS = 1024

__all__ = ["pack_documents"]


def _two_phase_cumsum(
    df: DataFrame, id_col: str, val_col: str, n_buckets: int
) -> DataFrame:
    """Adds ``_gs`` = exclusive global running sum of ``val_col`` in
    ``id_col`` order, without a global single-partition window."""
    lo, hi = df.agg(F.min(id_col), F.max(id_col)).first()
    if lo is None:
        return df.withColumn("_gs", F.lit(0).cast("long"))
    if lo == hi:
        bucket_col = F.lit(1).cast("long")
    else:
        # long→double is monotone non-decreasing: precision-collision
        # ids stay in one bucket, never reorder across buckets
        bucket_col = F.width_bucket(
            F.col(id_col).cast("double"),
            F.lit(float(lo)),
            F.lit(float(hi)),
            F.lit(n_buckets),
        )
    b = df.withColumn("_bucket", bucket_col)
    w = (
        Window.partitionBy("_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    b = b.withColumn("_local_end", F.sum(val_col).over(w))
    counts = sorted(
        (r["_bucket"], r["tot"])
        for r in b.groupBy("_bucket")
        .agg(F.sum(val_col).alias("tot"))
        .collect()
    )
    offsets, acc = [], 0
    for bucket, tot in counts:
        offsets.append((int(bucket), int(acc)))
        acc += int(tot)
    off_df = df.sparkSession.createDataFrame(
        offsets, "_bucket long, _offset long"
    )
    return (
        b.join(F.broadcast(off_df), on="_bucket")
        .withColumn(
            "_gs",
            (F.col("_offset") + F.col("_local_end") - F.col(val_col)).cast(
                "long"
            ),
        )
        .drop("_bucket", "_local_end", "_offset")
    )


def pack_documents(
    docs: DataFrame,
    capacity: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = _PACK_BUCKETS,
) -> DataFrame:
    """Packing manifest: ``[seq_id, doc_id, seq_offset, doc_offset,
    n_tok]`` — one row per (document, training-sequence) span, where
    the corpus token stream (docs concatenated in ``id_col`` order) is
    sliced into sequences of exactly ``capacity`` tokens.

    A document starting at global token offset g with n tokens spans
    sequences g DIV capacity .. (g+n-1) DIV capacity; each span row
    gives its offset inside the sequence and inside the document.
    Invariants (pinned by tests): per-sequence spans tile [0,
    capacity) exactly (except the final partial sequence), per-doc
    spans tile [0, n).

    Precondition: ``id_col`` values are unique (they define the
    concatenation order).  Token counts use the whitespace tokenizer
    (the pinned contract; swap ``tokens`` for a BPE count column
    upstream for real token budgets).
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    n = docs.select(
        id_col, F.size(tokens(text_col)).cast("long").alias("_n")
    )
    c = _two_phase_cumsum(n, id_col, "_n", n_buckets)
    cap = F.lit(capacity).cast("long")
    spans = (
        c.where(F.col("_n") > 0)  # ANSI: sequence(a, b) DESCENDS if b < a
        .withColumn(
            "seq_id",
            F.explode(
                F.sequence(
                    F.expr("_gs DIV " + str(capacity)),
                    F.expr(f"(_gs + _n - 1) DIV {capacity}"),
                )
            ),
        )
        .withColumn("_span_start", F.greatest("_gs", F.col("seq_id") * cap))
        .withColumn(
            "_span_end",
            F.least(F.col("_gs") + F.col("_n"), (F.col("seq_id") + 1) * cap),
        )
    )
    return spans.select(
        F.col("seq_id").cast("long").alias("seq_id"),
        id_col,
        (F.col("_span_start") - F.col("seq_id") * cap).alias("seq_offset"),
        (F.col("_span_start") - F.col("_gs")).alias("doc_offset"),
        (F.col("_span_end") - F.col("_span_start")).alias("n_tok"),
    )
