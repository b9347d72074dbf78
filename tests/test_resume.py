"""Durable checkpoint/resume coverage for the iterative algorithms
(north rule: any run resumable mid-iteration)."""

import json

from dachshund_spark import LinkGraph
from dachshund_spark.algorithms import connected_components, label_propagation
from dachshund_spark.checkpoint import CheckpointManager
from tests.fixtures import TWO_KARATE


def test_cc_resume_identical(spark, tmp_path):
    g = LinkGraph.from_edgelist(spark, TWO_KARATE)
    full = {
        (r.node_id): r.component
        for r in connected_components(g, renumber=False).collect()
    }

    # interrupted run: tiny superstep budget, committing every superstep
    mgr = CheckpointManager(spark, str(tmp_path / "cc"))
    connected_components(
        g, renumber=False, max_iterations=2, manager=mgr,
    )
    hist = mgr.history()
    assert hist, "no snapshots committed"
    assert all("lineage" in h and "message_count" in h for h in hist)

    # resumed run starts from the last committed superstep
    resumed = connected_components(g, renumber=False, manager=mgr, resume=True)
    out = {r.node_id: r.component for r in resumed.collect()}
    assert out == full
    # resume really started from the snapshot: new history extends old
    assert mgr.history()[0]["superstep"] <= mgr.history()[-1]["superstep"]


def test_lpa_resume_identical(spark, tmp_path):
    g = LinkGraph.from_edgelist(spark, TWO_KARATE)
    full = {(r.node_id): r.label for r in label_propagation(g, iterations=6).collect()}

    mgr = CheckpointManager(spark, str(tmp_path / "lpa"))
    label_propagation(g, iterations=3, manager=mgr, durable_checkpoint_every=1)
    latest = mgr.latest()
    assert latest is not None and latest[0] == 2  # supersteps 0..2 committed

    resumed = label_propagation(g, iterations=3, manager=mgr, resume=True)
    out = {r.node_id: r.label for r in resumed.collect()}
    assert out == full  # 3 committed + 3 resumed == 6 straight


def test_time_travel(spark, tmp_path):
    g = LinkGraph.from_edgelist(spark, TWO_KARATE)
    mgr = CheckpointManager(spark, str(tmp_path / "tt"))
    connected_components(
        g, renumber=False, max_iterations=4, manager=mgr, durable_checkpoint_every=1
    )
    # every committed superstep is retrievable (snapshot time travel)
    for meta in mgr.history():
        df = mgr.read_step(meta["superstep"])
        assert df.count() == 68


def test_metadata_contents(spark, tmp_path):
    g = LinkGraph.from_edgelist(spark, TWO_KARATE)
    mgr = CheckpointManager(spark, str(tmp_path / "meta"))
    connected_components(
        g, renumber=False, max_iterations=3, manager=mgr, durable_checkpoint_every=1
    )
    with open(mgr.meta_path) as fh:
        metas = [json.loads(l) for l in fh]
    for m in metas:
        assert {"superstep", "path", "num_partitions", "lineage", "message_count"} <= set(m)


def test_star_cc_resume_identical(spark, tmp_path):
    """Star-contraction CC resumes from a mid-run edge-set snapshot and
    lands on the same labels as an uninterrupted run."""
    from dachshund_spark.algorithms.components import connected_components_star

    g = LinkGraph.from_edgelist(spark, TWO_KARATE)
    full_df, _ = connected_components_star(g)
    full = {r.node_id: r.component for r in full_df.collect()}

    mgr = CheckpointManager(spark, str(tmp_path / "star"))
    connected_components_star(g, max_iterations=1, manager=mgr)
    assert mgr.history(), "no snapshots committed"

    resumed_df, _ = connected_components_star(g, manager=mgr, resume=True)
    out = {r.node_id: r.component for r in resumed_df.collect()}
    assert out == full


def test_stats_barrier_keeps_estimates_bounded(spark):
    """Superstep joins that reference the state twice compound Catalyst
    size estimates multiplicatively (BigInt digits grow geometrically),
    which spins the driver for minutes inside stats propagation after
    ~10 supersteps.  run_fixpoint's _stats_barrier must keep the
    estimate constant-size across supersteps."""
    from pyspark.sql import functions as F
    from dachshund_spark.iterate import run_fixpoint

    base = spark.range(200).selectExpr("id as k", "id % 13 as v")

    def step(st, i):
        # reference state twice through a join so the size estimate
        # would otherwise square every superstep
        a = st.select(F.col("k").alias("k1"), F.col("v").alias("v1"))
        b = st.select((F.col("k") % 13).alias("k2"), F.col("v").alias("v2"))
        j = a.join(b, a.k1 % 13 == b.k2).groupBy((F.col("k1")).alias("k")).agg(
            F.max("v2").alias("v")
        )
        return j

    final, _ = run_fixpoint(base, step, max_iterations=12)
    size = int(
        str(final._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    # without the barrier this exceeds 10**40 within a few supersteps
    # and reaches millions of digits by superstep 12
    assert size <= 2**63


def test_checkpoint_metadata_records_per_partition_frontier(spark, tmp_path):
    from pyspark.sql import functions as F

    from dachshund_spark.checkpoint import CheckpointManager

    mgr = CheckpointManager(spark, str(tmp_path / "ckpt"))
    state = spark.range(100).select(
        F.col("id").alias("node_id"), (F.col("id") % 7).alias("label")
    ).repartition(4)
    mgr.commit(0, state, metrics={"message_count": 100})
    meta = mgr.history()[0]
    assert meta["frontier_rows"] == 100
    assert sum(p["rows"] for p in meta["partitions"]) == 100
    assert len(meta["partitions"]) == meta["num_partitions"]
    assert meta["partitions_truncated"] is False
    assert meta["message_count"] == 100
    assert meta["lineage"]["parent_superstep"] is None
