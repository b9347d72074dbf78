"""spark-submit job for the kill-resume bench (VERDICT r3 #8).

Runs durable-checkpointed PageRank over a parquet edge table and
writes the final per-vertex scores::

    spark-submit --master local[16] --py-files dachshund_spark.zip \
        tools/resume_job.py <edges_dir> <ckpt_dir> <out_dir> <iters>

The checkpoint protocol (CheckpointManager + run_fixpoint) makes the
run resumable: re-submitting the identical command after a mid-run
SIGKILL resumes from the last committed superstep and spends only the
remaining budget (pagerank treats fixed_iterations as a TOTAL across
resumed runs).  Prints one JSON line with the resume point, superstep
history, wall time, and the L1 norm of the scores.
"""

import json
import sys
import time


def main() -> None:
    edges_dir, ckpt_dir, out_dir, iters = (
        sys.argv[1],
        sys.argv[2],
        sys.argv[3],
        int(sys.argv[4]),
    )
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from dachshund_spark.algorithms import pagerank
    from dachshund_spark.checkpoint import CheckpointManager
    from dachshund_spark.graph import LinkGraph

    spark = SparkSession.builder.getOrCreate()
    mgr = CheckpointManager(spark, ckpt_dir)
    latest = mgr.latest()
    resumed_from = None if latest is None else latest[0]

    g = LinkGraph(spark.read.parquet(edges_dir))
    t0 = time.time()
    scores = pagerank(
        g,
        fixed_iterations=iters,
        join_hint="broadcast",
        dedupe_edges=False,
        cache_edges=False,
        manager=mgr,
        resume=True,
    )
    scores.write.mode("overwrite").parquet(out_dir)
    dt = time.time() - t0
    out = spark.read.parquet(out_dir)
    l1 = out.agg(F.sum(F.abs(F.col("pagerank")))).collect()[0][0]
    print(
        "RESUME_JOB "
        + json.dumps(
            {
                "resumed_from_superstep": resumed_from,
                "committed_supersteps": [m["superstep"] for m in mgr.history()],
                "seconds": round(dt, 2),
                "rows": out.count(),
                "l1": l1,
            }
        )
    )


if __name__ == "__main__":
    main()
