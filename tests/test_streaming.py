import time

from pyspark.sql import functions as F

from dachshund_spark.streaming import (
    incremental_degree_counts,
    stream_edges_from_tsv,
    windowed_edge_rates,
)


def test_incremental_degrees(spark, tmp_path):
    src_dir = tmp_path / "drops"
    src_dir.mkdir()
    (src_dir / "a.tsv").write_text("g\t1\t2\ng\t1\t3\ng\t2\t3\n")

    stream = stream_edges_from_tsv(spark, str(src_dir))
    assert stream.isStreaming
    q = incremental_degree_counts(
        stream, str(tmp_path / "state"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    state = spark.read.parquet(str(tmp_path / "state"))
    deg = {r.src: r.out_degree for r in state.collect()}
    assert deg == {1: 2, 2: 1}

    # second drop merges incrementally (same stream checkpoint)
    (src_dir / "b.tsv").write_text("g\t1\t9\ng\t5\t6\n")
    q2 = incremental_degree_counts(
        stream_edges_from_tsv(spark, str(src_dir)),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    deg = {
        r.src: r.out_degree
        for r in spark.read.parquet(str(tmp_path / "state")).collect()
    }
    assert deg == {1: 3, 2: 1, 5: 1}


def test_windowed_rates_batch_parity(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = windowed_edge_rates(events.select("ts", "event_type"))
    total = out.agg(F.sum("n_events")).first()[0]
    assert total == events.count()
