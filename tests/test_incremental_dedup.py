"""Incremental seen-hash dedup state: marking, replay idempotence."""

from dachshund_spark.streaming import merge_seen_batch


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _marked(df):
    return {r["doc_id"]: r["is_dup"] for r in df.collect()}


def test_cross_and_intra_batch_marking(spark, tmp_path):
    state = str(tmp_path / "state")
    b0 = _batch(spark, [(1, "alpha"), (2, "beta"), (3, "alpha")])
    m0 = _marked(merge_seen_batch(spark, b0, 0, state))
    # intra-batch: doc 3 repeats doc 1's text
    assert m0 == {1: False, 2: False, 3: True}
    b1 = _batch(spark, [(10, "beta"), (11, "gamma"), (12, "gamma")])
    m1 = _marked(merge_seen_batch(spark, b1, 1, state))
    # cross-batch: beta already seen; gamma dups within the batch
    assert m1 == {10: True, 11: False, 12: True}


def test_replay_is_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    b0 = _batch(spark, [(1, "x"), (2, "y")])
    merge_seen_batch(spark, b0, 0, state)
    b1 = _batch(spark, [(5, "x"), (6, "z"), (7, "z")])
    first = _marked(merge_seen_batch(spark, b1, 1, state))
    # crash-after-commit replay: same batch id again -> same marking,
    # including the first-occurrence rows staying non-duplicate even
    # though the state now contains this batch's own hashes
    replay = _marked(merge_seen_batch(spark, b1, 1, state))
    assert first == replay == {5: True, 6: False, 7: True}


def test_streaming_end_to_end(spark, tmp_path):
    import glob
    import time

    from dachshund_spark.streaming import incremental_doc_dedup

    src = str(tmp_path / "src")
    _batch(spark, [(1, "a"), (2, "b"), (3, "a")]).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(src)
    )
    q = incremental_doc_dedup(
        stream,
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )
    q.awaitTermination(60)
    for _ in range(20):
        if glob.glob(str(tmp_path / "out" / "*.parquet")):
            break
        time.sleep(0.5)
    out = _marked(spark.read.parquet(str(tmp_path / "out")))
    assert out == {1: False, 2: False, 3: True}
