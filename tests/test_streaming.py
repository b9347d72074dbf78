import os
import time

from pyspark.sql import functions as F

from dachshund_spark.streaming import (
    incremental_degree_counts,
    merge_degree_batch,
    read_degree_state,
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

    state = read_degree_state(spark, str(tmp_path / "state"))
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
        for r in read_degree_state(spark, str(tmp_path / "state")).collect()
    }
    assert deg == {1: 3, 2: 1, 5: 1}


def _degrees(spark, state_path):
    return {
        (r.graph_id, r.src): r.out_degree
        for r in read_degree_state(spark, state_path).collect()
    }


def test_merge_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-applying the same batch_id must
    not double-count (per-bucket _last_batch markers)."""
    state = str(tmp_path / "state")
    batch = spark.createDataFrame(
        [(0, 1, 2), (0, 1, 3), (0, 2, 3)], "graph_id long, src long, dst long"
    )
    merge_degree_batch(spark, batch, 0, state, num_buckets=4)
    before = _degrees(spark, state)
    assert before == {(0, 1): 2, (0, 2): 1}
    # replay of batch 0 after a simulated failure-before-checkpoint
    rewritten = merge_degree_batch(spark, batch, 0, state, num_buckets=4)
    assert rewritten == []
    assert _degrees(spark, state) == before
    # a genuinely new batch still merges
    batch1 = spark.createDataFrame([(0, 1, 9)], "graph_id long, src long, dst long")
    merge_degree_batch(spark, batch1, 1, state, num_buckets=4)
    assert _degrees(spark, state) == {(0, 1): 3, (0, 2): 1}


def test_merge_cost_is_o_batch_not_o_state(spark, tmp_path):
    """A small batch rewrites only the buckets it touches: every other
    bucket dir's files are bit-identical afterwards."""
    state = str(tmp_path / "state")
    big = spark.range(2000).select(
        F.lit(0).cast("long").alias("graph_id"),
        F.col("id").alias("src"),
        (F.col("id") + 1).alias("dst"),
    )
    merge_degree_batch(spark, big, 0, state, num_buckets=8)
    snapshot = {}
    for b in (d for d in os.listdir(state) if d.startswith("bucket=")):
        bdir = os.path.join(state, b)
        snapshot[b] = sorted(
            (f, os.path.getmtime(os.path.join(bdir, f)), os.path.getsize(os.path.join(bdir, f)))
            for f in os.listdir(bdir)
        )
    assert len(snapshot) == 8  # 2000 keys populate every bucket

    one = spark.createDataFrame([(0, 7, 123)], "graph_id long, src long, dst long")
    time.sleep(0.05)
    rewritten = merge_degree_batch(spark, one, 1, state, num_buckets=8)
    assert len(rewritten) == 1  # exactly the bucket of key (0, 7)
    untouched = [b for b in snapshot if b != f"bucket={rewritten[0]}"]
    for b in untouched:
        bdir = os.path.join(state, b)
        now = sorted(
            (f, os.path.getmtime(os.path.join(bdir, f)), os.path.getsize(os.path.join(bdir, f)))
            for f in os.listdir(bdir)
        )
        assert now == snapshot[b], f"{b} was rewritten by a batch not touching it"
    assert _degrees(spark, state)[(0, 7)] == 2


def test_windowed_rates_batch_parity(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = windowed_edge_rates(events.select("ts", "event_type"))
    total = out.agg(F.sum("n_events")).first()[0]
    assert total == events.count()


def test_sessionize_stream_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: state survives across
    micro-batch runs via the checkpoint; a later event past the gap
    closes the stored session."""
    from dachshund_spark.streaming import sessionize_stream

    drops = tmp_path / "ev"
    drops.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        raw = spark.readStream.format("text").load(str(drops))
        c = F.split(F.col("value"), "\t")
        ev = raw.select(
            c[0].cast("long").alias("user_id"),
            c[1].cast("long").alias("ts_epoch"),
        )
        q = (
            sessionize_stream(ev, gap_seconds=600)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: u1 has two close events; u2 one — nothing closes yet
    (drops / "a.tsv").write_text("1\t100\n1\t200\n2\t50\n")
    run_once()
    # batch 2: u1 jumps past the gap -> session (100,200,2) closes
    (drops / "b.tsv").write_text("1\t5000\n")
    run_once()

    rows = spark.read.parquet(out_dir).collect()
    closed = {(r.user_id, r.session_start, r.session_end, r.n_events) for r in rows}
    assert (1, 100, 200, 2) in closed
    # u2 never got a follow-up event or timeout: still open, not emitted
    assert not any(r.user_id == 2 for r in rows)


def test_incremental_cc_merges_components(spark, tmp_path):
    """Streaming CC: batch 1 builds two components; batch 2's bridge
    edge merges them to the smaller label without recomputing from the
    raw edge history (state is the node->label star)."""
    import os

    from dachshund_spark.streaming import merge_cc_batch

    state = str(tmp_path / "ccstate")
    os.makedirs(state, exist_ok=True)
    b0 = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "src long, dst long")
    merge_cc_batch(spark, b0, 0, state)
    labels = {
        r.node_id: r.label
        for r in spark.read.parquet(state + "/data").collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    # replay of batch 0 is a no-op
    merge_cc_batch(spark, b0, 0, state)
    # batch 1 bridges the components
    b1 = spark.createDataFrame([(3, 10)], "src long, dst long")
    merge_cc_batch(spark, b1, 1, state)
    labels = {
        r.node_id: r.label
        for r in spark.read.parquet(state + "/data").collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 10: 1, 11: 1}


def test_merge_crash_recovery_between_renames(spark, tmp_path):
    """A crash between (bdir -> .old) and (.tmp -> bdir) must not lose
    the bucket's accumulated counts: the next merge restores the .old
    survivor before reading."""
    import shutil

    state = str(tmp_path / "state")
    b0 = spark.createDataFrame([(0, 1, 2), (0, 1, 3)], "graph_id long, src long, dst long")
    merge_degree_batch(spark, b0, 0, state, num_buckets=4)
    assert _degrees(spark, state) == {(0, 1): 2}
    # simulate the crash window: bucket dir renamed away, tmp vanished
    [bdir] = [d for d in os.listdir(state) if d.startswith("bucket=")]
    b = int(bdir.split("=")[1])
    os.rename(os.path.join(state, bdir), os.path.join(state, f".old-1-{b}"))
    # replay/next batch recovers the old dir, then merges on top
    b1 = spark.createDataFrame([(0, 1, 9)], "graph_id long, src long, dst long")
    merge_degree_batch(spark, b1, 1, state, num_buckets=4)
    assert _degrees(spark, state) == {(0, 1): 3}


def test_merge_num_buckets_pinned(spark, tmp_path):
    import pytest

    state = str(tmp_path / "state")
    b0 = spark.createDataFrame([(0, 1, 2)], "graph_id long, src long, dst long")
    merge_degree_batch(spark, b0, 0, state, num_buckets=4)
    with pytest.raises(ValueError, match="num_buckets"):
        merge_degree_batch(spark, b0, 1, state, num_buckets=8)


def test_cc_crash_recovery(spark, tmp_path):
    from dachshund_spark.streaming import merge_cc_batch

    state = str(tmp_path / "cc")
    os.makedirs(state)
    b0 = spark.createDataFrame([(1, 2)], "src long, dst long")
    merge_cc_batch(spark, b0, 0, state)
    # crash window: data renamed to .old, new data never landed
    os.rename(os.path.join(state, "data"), os.path.join(state, ".old-1"))
    b1 = spark.createDataFrame([(2, 3)], "src long, dst long")
    merge_cc_batch(spark, b1, 1, state)
    labels = {
        r.node_id: r.label
        for r in spark.read.parquet(os.path.join(state, "data")).collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1}  # prior state survived the crash


def test_incremental_token_counts(spark, tmp_path):
    from dachshund_spark.streaming import merge_token_batch, read_token_state

    state = str(tmp_path / "tok_state")
    b0 = spark.createDataFrame(
        [(0, "a b a"), (1, "b c")], "doc_id long, text string"
    )
    b1 = spark.createDataFrame([(2, "a c c")], "doc_id long, text string")
    merge_token_batch(spark, b0, 0, state, num_buckets=4)
    merge_token_batch(spark, b1, 1, state, num_buckets=4)
    got = {r.token: r.tf for r in read_token_state(spark, state).collect()}
    assert got == {"a": 3, "b": 2, "c": 3}
    # at-least-once replay of batch 1 must be a no-op
    rewritten = merge_token_batch(spark, b1, 1, state, num_buckets=4)
    assert rewritten == []
    got = {r.token: r.tf for r in read_token_state(spark, state).collect()}
    assert got == {"a": 3, "b": 2, "c": 3}


def test_incremental_token_counts_stream(spark, tmp_path):
    import os

    from dachshund_spark.streaming import incremental_token_counts, read_token_state

    src = tmp_path / "docs_in"
    os.makedirs(src)
    spark.createDataFrame(
        [(0, "x y"), (1, "y z y")], "doc_id long, text string"
    ).write.parquet(str(src / "p0"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = incremental_token_counts(
        stream, str(tmp_path / "tok_state"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = {
        r.token: r.tf
        for r in read_token_state(spark, str(tmp_path / "tok_state")).collect()
    }
    assert got == {"x": 1, "y": 3, "z": 1}
