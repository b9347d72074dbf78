"""Real `spark-submit --py-files` launch — the north rule's named
cluster entry shape, executed end-to-end in a subprocess.

The job script imports dachshund_spark from the shipped zip only (cwd
is a temp dir, repo not on sys.path), so a packaging regression — a
module missing from the zip, an import that only works in-repo — fails
here and nowhere else.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_roundtrip(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark

        spark_submit = os.path.join(
            os.path.dirname(pyspark.__file__), "bin", "spark-submit"
        )
    assert os.path.exists(spark_submit), "spark-submit not found"

    sys.path.insert(0, REPO)
    from tools.make_pyfiles_zip import make_zip

    zip_path = make_zip(str(tmp_path / "dachshund_spark.zip"))
    job = str(tmp_path / "job.py")
    shutil.copy(os.path.join(REPO, "tools", "submit_job.py"), job)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # imports must come from --py-files
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            job,
            "/root/testdata/sf0.001",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),  # NOT the repo: the zip is the only source
        env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("SUBMIT_RESULT ")]
    assert lines, out.stdout[-2000:]
    result = json.loads(lines[-1].removeprefix("SUBMIT_RESULT "))
    # PageRank over a stochastic-complemented graph conserves rank mass
    assert result["rank_sum"] == 1.0
    assert len(result["top"]) == 5
    # cross-check against the in-process run of the same computation
    from pyspark.sql import functions as F

    from dachshund_spark.algorithms import pagerank
    from dachshund_spark.derived import derived_graph
    from dachshund_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    pr = pagerank(derived_graph(spark, "/root/testdata/sf0.001"), fixed_iterations=10)
    top = (
        pr.orderBy(F.desc("pagerank"), F.asc("node_id")).limit(5)
        .select("node_id", F.round("pagerank", 8).alias("pagerank")).collect()
    )
    assert result["top"] == [[int(r.node_id), float(r.pagerank)] for r in top]
