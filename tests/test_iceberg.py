"""Iceberg integration: the runtime is absent in this sandbox, so these
tests pin the probe/fallback behavior and the SQL contract; the real
write paths light up unchanged on a cluster with the jars."""

from dachshund_spark.iceberg import (
    MERGE_DEGREE_SQL,
    IcebergCheckpointManager,
    iceberg_available,
)


def test_probe_is_false_without_jars(spark):
    assert iceberg_available(spark) is False


def test_checkpoint_manager_falls_back_to_shim(spark, tmp_path):
    from pyspark.sql import functions as F

    mgr = IcebergCheckpointManager(spark, str(tmp_path / "ckpt"), table="lake.db.t")
    assert mgr.use_iceberg is False
    state = spark.range(5).select(F.col("id").alias("node_id"), F.lit(0.2).alias("rank"))
    re_read = mgr.commit(0, state)
    assert re_read.count() == 5
    latest = mgr.latest()
    assert latest is not None and latest[0] == 0


def test_merge_sql_shape():
    sql = MERGE_DEGREE_SQL.format(table="lake.db.degrees")
    assert "MERGE INTO lake.db.degrees" in sql
    assert "WHEN MATCHED THEN UPDATE" in sql
    assert "WHEN NOT MATCHED THEN INSERT" in sql
