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

import os
import shutil

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


def _bucket_dir(state_path: str, bucket: int) -> str:
    return os.path.join(state_path, f"bucket={bucket}")


def _bucket_last_batch(bdir: str) -> int:
    """Batch id recorded inside a bucket dir (-1 if never written).
    The marker file travels with the atomic directory rename, so a
    bucket is either fully at batch N or fully at batch N-1."""
    marker = os.path.join(bdir, "_last_batch")
    if not os.path.exists(marker):
        return -1
    with open(marker) as fh:
        return int(fh.read().strip())


def _recover_renamed_dir(target: str, old_glob: str) -> None:
    """Crash recovery for the two-step swap (target→.old, .tmp→target):
    a crash between the renames leaves the data only in the .old dir.
    If the target is missing but a .old survivor exists, rename the
    NEWEST one (by the batch id embedded in the name — numeric, not
    lexicographic: '.old-10-…' beats '.old-2-…') back before
    proceeding; stale survivors are removed so they can never be
    mistaken for the live state on a later crash."""
    import glob as _glob

    def batch_of(path: str) -> int:
        return int(os.path.basename(path).split("-")[1])

    survivors = sorted(_glob.glob(old_glob), key=batch_of)
    if not os.path.isdir(target) and survivors:
        os.rename(survivors.pop(), target)
    for stale in survivors:
        shutil.rmtree(stale, ignore_errors=True)


def _load_state_num_buckets(state_path: str, num_buckets: int) -> int:
    """Pin the bucket count in the state dir on first use; a later
    caller with a different value would split keys across buckets and
    silently double-count on read.  The marker is written atomically
    (temp + rename) so a crash mid-write cannot leave a truncated file
    that wedges every later merge."""
    marker = os.path.join(state_path, "_num_buckets")
    if os.path.exists(marker):
        with open(marker) as fh:
            stored = int(fh.read().strip())
        if stored != num_buckets:
            raise ValueError(
                f"state at {state_path} was created with num_buckets={stored}; "
                f"got {num_buckets} — re-bucketing requires a fresh state dir"
            )
        return stored
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(str(num_buckets))
    os.rename(tmp, marker)
    return num_buckets


def merge_degree_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    num_buckets: int = 16,
) -> list[int]:
    """Idempotent O(batch) merge of one micro-batch into the bucketed
    degree state.  Returns the list of bucket ids actually rewritten.

    State layout: ``state_path/bucket=B/`` parquet dirs, key-hashed by
    ``pmod(xxhash64(graph_id, src), num_buckets)``.  Only buckets the
    batch touches are read and rewritten — per-batch cost is
    O(batch + touched-state), not O(total state).

    foreachBatch is at-least-once, so each bucket dir carries a
    ``_last_batch`` marker; a replayed batch (marker >= batch_id) is
    skipped per bucket, and the rewrite is write-temp-then-rename so a
    bucket is never observed half-merged.  (On object stores this merge
    is Iceberg MERGE INTO territory; the bucket scheme is the
    jar-free analog with the same touched-partition cost model.)
    """
    partial = batch_df.groupBy("graph_id", "src").agg(
        F.count("*").alias("out_degree")
    )
    return _merge_counts_batch(
        spark, partial, batch_id, state_path, num_buckets,
        ["graph_id", "src"], "out_degree",
    )


def _merge_counts_batch(
    spark: SparkSession,
    partial: DataFrame,
    batch_id: int,
    state_path: str,
    num_buckets: int,
    key_cols: list[str],
    value_col: str,
    agg: str = "sum",
) -> list[int]:
    """Generic bucketed additive-counter merge: ``partial`` is this
    batch's pre-aggregated [key_cols..., value_col]; state buckets are
    keyed by ``pmod(xxhash64(*key_cols), num_buckets)``.  Shared by the
    degree and token-count streaming states — idempotence markers,
    crash recovery, and atomic swaps live here once."""
    os.makedirs(state_path, exist_ok=True)
    _load_state_num_buckets(state_path, num_buckets)  # before any Spark work
    partial = partial.withColumn(
        "bucket", F.pmod(F.xxhash64(*key_cols), F.lit(num_buckets))
    ).persist()
    touched = sorted(r[0] for r in partial.select("bucket").distinct().collect())
    rewritten: list[int] = []
    for b in touched:
        bdir = _bucket_dir(state_path, b)
        _recover_renamed_dir(bdir, os.path.join(state_path, f".old-*-{b}"))
        if _bucket_last_batch(bdir) >= batch_id:
            continue  # replay of an already-applied batch: skip
        part_b = partial.where(F.col("bucket") == b).drop("bucket")
        if os.path.isdir(bdir):
            agg_fn = F.min if agg == "min" else F.sum
            merged = (
                spark.read.parquet(bdir)
                .unionByName(part_b)
                .groupBy(*key_cols)
                .agg(agg_fn(value_col).alias(value_col))
            )
        else:
            merged = part_b
        tmp = os.path.join(state_path, f".tmp-{batch_id}-{b}")
        merged.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_last_batch"), "w") as fh:
            fh.write(str(batch_id))
        old = os.path.join(state_path, f".old-{batch_id}-{b}")
        # a replay after a crash-before-cleanup can find old already
        # present — clear it or the rename below raises ENOTEMPTY
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(bdir):
            os.rename(bdir, old)
        os.rename(tmp, bdir)
        shutil.rmtree(old, ignore_errors=True)
        rewritten.append(b)
    partial.unpersist()
    return rewritten


def merge_token_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    num_buckets: int = 16,
    text_col: str = "text",
) -> list[int]:
    """Idempotent O(batch) merge of a document micro-batch into a
    bucketed corpus token-frequency state [token, tf] — the streaming
    twin of :func:`dachshund_spark.pipeline.text.vocabulary`'s tf side
    (document frequency is NOT maintained: exact df would need the full
    (token, doc) pair history, which is the corpus itself)."""
    from dachshund_spark.pipeline.text import tokens

    partial = (
        batch_df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return _merge_counts_batch(
        spark, partial, batch_id, state_path, num_buckets, ["token"], "tf"
    )


def read_degree_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Current merged degree table across all bucket dirs.

    Runs the same ``.old-*`` crash recovery as the merge path first: a
    crash between the two swap renames leaves a bucket's data only in
    its ``.old-N-B`` survivor, and the ``bucket=*`` glob would silently
    skip the missing dir — undercounting with no error — until a later
    batch happened to touch that bucket.
    """
    return _read_bucketed_state(spark, state_path)


def _read_bucketed_state(spark: SparkSession, state_path: str) -> DataFrame:
    import glob as _glob
    import re as _re

    for survivor in _glob.glob(os.path.join(state_path, ".old-*-*")):
        m = _re.match(r"\.old-\d+-(\d+)$", os.path.basename(survivor))
        if m:
            b = int(m.group(1))
            _recover_renamed_dir(
                _bucket_dir(state_path, b),
                os.path.join(state_path, f".old-*-{b}"),
            )
    return spark.read.option("basePath", state_path).parquet(
        os.path.join(state_path, "bucket=*")
    ).drop("bucket")


def read_token_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Current merged [token, tf] table (same crash recovery as
    :func:`read_degree_state`)."""
    return _read_bucketed_state(spark, state_path)


def incremental_degree_counts(
    edges_stream: DataFrame,
    state_path: str,
    checkpoint_path: str,
    num_buckets: int = 16,
):
    """Maintain a durable out-degree table incrementally via
    ``foreachBatch`` → :func:`merge_degree_batch` (bucketed, idempotent,
    O(batch) per micro-batch).  Returns the StreamingQuery.
    """
    spark = edges_stream.sparkSession

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_degree_batch(spark, batch_df, batch_id, state_path, num_buckets)

    return (
        edges_stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def incremental_token_counts(
    docs_stream: DataFrame,
    state_path: str,
    checkpoint_path: str,
    num_buckets: int = 16,
    text_col: str = "text",
):
    """Maintain a durable corpus token-frequency table incrementally
    (``foreachBatch`` → :func:`merge_token_batch`).  Returns the
    StreamingQuery."""
    spark = docs_stream.sparkSession

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_token_batch(
            spark, batch_df, batch_id, state_path, num_buckets, text_col
        )

    return (
        docs_stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def merge_cc_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
) -> None:
    """Incremental connected components over an edge stream.

    State: parquet [node_id, label] (label = smallest member id, the
    same invariant as algorithms.connected_components).  Each batch
    runs hash-min over (batch edges ∪ node→label star edges).  The
    star graph has diameter ≤ 2, so convergence needs only ~2-3
    rounds + the batch's own mixing — a full recompute would pay the
    whole graph's diameter over ALL edges every batch.  Idempotent via
    a _last_batch marker; atomic rename like merge_degree_batch.
    (On Iceberg this is a MERGE over the touched label partitions.)
    """
    marker = os.path.join(state_path, "_last_batch")
    if os.path.exists(marker):
        with open(marker) as fh:
            if int(fh.read().strip()) >= batch_id:
                return
    data = os.path.join(state_path, "data")
    # crash between the two swap renames leaves the labels only in the
    # .old dir — restore them instead of silently starting empty
    _recover_renamed_dir(data, os.path.join(state_path, ".old-*"))
    new_edges = batch_df.select("src", "dst").where(F.col("src") != F.col("dst"))
    if os.path.isdir(data):
        # explicit existence check — a read ERROR must propagate, never
        # be mistaken for "first batch" (that would discard all labels)
        state = spark.read.parquet(data)
        star = state.select(
            F.col("node_id").alias("src"), F.col("label").alias("dst")
        ).where(F.col("src") != F.col("dst"))
        edges = new_edges.unionByName(star)
    else:
        edges = new_edges

    from dachshund_spark.algorithms.components import connected_components
    from dachshund_spark.graph import LinkGraph

    merged = connected_components(LinkGraph(edges), renumber=False).select(
        "node_id", F.col("component").alias("label")
    )
    merged.persist()
    merged.count()
    tmp = os.path.join(state_path, f".tmp-{batch_id}")
    merged.write.mode("overwrite").parquet(tmp)
    merged.unpersist()
    old = os.path.join(state_path, f".old-{batch_id}")
    # replay after a crash-before-cleanup: old may already exist and a
    # rename onto a non-empty dir raises ENOTEMPTY
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(data):
        os.rename(data, old)
    os.rename(tmp, data)
    shutil.rmtree(old, ignore_errors=True)
    mtmp = marker + ".tmp"
    with open(mtmp, "w") as fh:
        fh.write(str(batch_id))
    os.rename(mtmp, marker)


def incremental_connected_components(
    edges_stream: DataFrame,
    state_path: str,
    checkpoint_path: str,
):
    """foreachBatch wrapper over :func:`merge_cc_batch`; returns the
    StreamingQuery.  Read the labels back with
    ``spark.read.parquet(state_path + "/data")``."""
    spark = edges_stream.sparkSession
    os.makedirs(state_path, exist_ok=True)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_cc_batch(spark, batch_df, batch_id, state_path)

    return (
        edges_stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts_epoch",
):
    """Custom stateful operator: streaming sessionization with
    ``applyInPandasWithState`` (the batch twin is
    relational.sessionize_events).

    Input: a streaming frame ``[user_id long, ts_epoch long]``.  Output
    (append mode): one row per CLOSED session ``[user_id,
    session_start, session_end, n_events]`` — a session closes when a
    later event for the same user arrives more than ``gap_seconds``
    after the session's last event, or when the state times out at
    ``gap_seconds`` of processing time.  The open session per user
    lives in the state store (checkpointed, exactly-once).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        import pandas as pd  # executor-side

        (user,) = key
        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(t) for t in pdf[ts_col])
        closed: list[tuple[int, int, int, int]] = []
        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                closed.append((user, s, e, n))
                state.remove()
        else:
            open_sess = state.get if state.exists else None
            for t in sorted(ts):
                if open_sess is None:
                    open_sess = (t, t, 1)
                elif t - open_sess[1] > gap_seconds:
                    closed.append((user, *open_sess))
                    open_sess = (t, t, 1)
                else:
                    # late cross-batch events may precede the stored
                    # span: widen with min/max so session_end never
                    # regresses (a regressed end would mis-split later)
                    open_sess = (
                        min(open_sess[0], t),
                        max(open_sess[1], t),
                        open_sess[2] + 1,
                    )
            if open_sess is not None:
                state.update(open_sess)
                state.setTimeoutDuration(gap_seconds * 1000)
        yield pd.DataFrame(
            closed, columns=[user_col, "session_start", "session_end", "n_events"]
        )

    return events.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=(
            f"{user_col} long, session_start long, session_end long, n_events long"
        ),
        stateStructType="start long, end long, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
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


def merge_seen_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    state_path: str,
    num_buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental corpus dedup: mark this batch's duplicates against
    the durable seen-hash state, then fold the batch in.  Returns the
    marked batch ``[doc_id, text_hash, is_dup]`` (an action — the
    state update happens before return).

    The state stores per text-hash the MIN ``first_seen`` key
    (batch_id·2^40 + doc_id, totally ordered across batches); a row is
    a duplicate iff some occurrence of its hash — durable state OR
    earlier in this batch — has a smaller key.  Because first_seen is
    a min (idempotent merge) and the comparison is strict, REPLAYING a
    crashed batch yields the identical marking: the row that was first
    keeps first_seen == its own key and stays non-duplicate.  Same
    bucket/marker/rename crash story as the degree and token states
    (_merge_counts_batch).
    """
    from dachshund_spark.pipeline.text import md5_long

    import glob as _glob

    keyed = batch.select(
        id_col,
        md5_long(F.col(text_col)).alias("text_hash"),
        (F.lit(int(batch_id)) * F.lit(1 << 40) + F.col(id_col)).alias("_k"),
    ).persist()
    state = (
        _read_bucketed_state(spark, state_path)
        if _glob.glob(os.path.join(state_path, "bucket=*"))
        else None
    )
    if state is None:
        seen = keyed.select("text_hash", F.col("_k").alias("first_seen"))
    else:
        seen = state.select("text_hash", "first_seen").unionByName(
            keyed.select("text_hash", F.col("_k").alias("first_seen"))
        )
    firsts = seen.groupBy("text_hash").agg(F.min("first_seen").alias("_f"))
    marked = (
        keyed.join(firsts, on="text_hash")
        .select(
            id_col,
            "text_hash",
            (F.col("_k") > F.col("_f")).alias("is_dup"),
        )
        .localCheckpoint(eager=True)
    )
    partial = keyed.groupBy("text_hash").agg(F.min("_k").alias("first_seen"))
    _merge_counts_batch(
        spark,
        partial,
        batch_id,
        state_path,
        num_buckets,
        ["text_hash"],
        "first_seen",
        agg="min",
    )
    keyed.unpersist()
    return marked


def incremental_doc_dedup(
    docs_stream: DataFrame,
    state_path: str,
    checkpoint_path: str,
    out_path: str,
    num_buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """foreachBatch wrapper: mark each micro-batch against the seen
    state and append the marked rows to ``out_path``.  Returns the
    StreamingQuery."""
    spark = docs_stream.sparkSession

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        marked = merge_seen_batch(
            spark, batch_df, batch_id, state_path, num_buckets,
            text_col, id_col,
        )
        marked.write.mode("append").parquet(out_path)

    return (
        docs_stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
