"""Example cluster job for `spark-submit --py-files dachshund_spark.zip`.

Runs the flagship superstep pipeline (derived edge table → 10-superstep
PageRank → top-5) importing dachshund_spark ONLY from the shipped
--py-files zip (the repo dir is NOT on sys.path when launched via
spark-submit from elsewhere), and prints one JSON line.  This is the
launch shape the north rule names; tests/test_submit.py executes it for
real against local[4].

    spark-submit --master local[4] --py-files dachshund_spark.zip \
        tools/submit_job.py /root/testdata/sf0.001
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # Imports resolve from the --py-files zip distributed to driver and
    # executors by spark-submit.
    from pyspark.sql import SparkSession, functions as F

    from dachshund_spark.algorithms import pagerank
    from dachshund_spark.derived import derived_graph

    spark = SparkSession.builder.appName("dachshund_submit_demo").getOrCreate()
    g = derived_graph(spark, sf_dir)
    pr = pagerank(g, fixed_iterations=10)
    top = (
        pr.orderBy(F.desc("pagerank"), F.asc("node_id"))
        .limit(5)
        .select("node_id", F.round("pagerank", 8).alias("pagerank"))
        .collect()
    )
    total = pr.agg(F.round(F.sum("pagerank"), 6)).first()[0]
    print(
        "SUBMIT_RESULT "
        + json.dumps(
            {
                "top": [[int(r.node_id), float(r.pagerank)] for r in top],
                "rank_sum": float(total),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
