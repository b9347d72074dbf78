"""Structured Streaming ingestion for the edge table.

The reference is batch-only: a blocking stdin loop that cuts batches on
graph_id change (/root/reference/src/dachshund/transformer_base.rs:58-91).
The engine's streaming analog ingests edge files (TSV or parquet drops,
e.g. from a crawler) as a Structured Stream and maintains incremental
state via ``foreachBatch`` merges — each micro-batch plays the role of
one reference batch, with exactly-once bookkeeping from the stream
checkpoint instead of an mpsc writer thread.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def stream_edges_from_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Streaming source over a directory of 3-col TSV drops
    (``graph_key\\tsrc\\tdst``) → streaming edges frame.

    Graph keys are hashed (xxhash64) rather than dense-ranked: dense
    first-seen numbering is inherently order-dependent and meaningless
    under streaming arrival; the hash is stable and collision-checked
    downstream.
    """
    raw = spark.readStream.format("text").load(path)
    c = F.split(F.col("value"), "\t")
    return raw.select(
        F.xxhash64(c[0]).alias("graph_id"),
        c[1].cast("long").alias("src"),
        c[2].cast("long").alias("dst"),
    )


def incremental_degree_counts(
    edges_stream: DataFrame,
    state_path: str,
    checkpoint_path: str,
):
    """Maintain a durable out-degree table incrementally.

    Each micro-batch's partial counts are merged into the parquet state
    via ``foreachBatch`` (read-modify-write against the snapshot dir —
    the Iceberg MERGE INTO analog under this sandbox's parquet shim).
    Returns the StreamingQuery.
    """
    spark = edges_stream.sparkSession

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        partial = batch_df.groupBy("graph_id", "src").agg(
            F.count("*").alias("out_degree")
        )
        try:
            current = spark.read.parquet(state_path)
            merged = (
                current.unionByName(partial)
                .groupBy("graph_id", "src")
                .agg(F.sum("out_degree").alias("out_degree"))
            )
        except Exception:  # first batch: no state yet
            merged = partial
        merged.persist()
        merged.count()
        merged.write.mode("overwrite").parquet(state_path)
        merged.unpersist()

    return (
        edges_stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def windowed_edge_rates(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window event counts — the late-data-safe
    streaming aggregation shape (works on streaming or batch frames)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )
