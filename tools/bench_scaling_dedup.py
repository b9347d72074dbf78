"""Second-workload scaling evidence: ExactSubstr gram hashing.

Same two-parallelism method as tools/bench_scaling.py (fresh
subprocess per core count, input generated once as parquet, warmup
before the timed run), but the job is the dedup pipeline's
duplicate_spans — explode every 32-char window, md5-hash it, one
groupBy shuffle — i.e. CPU-bound columnar work with a single wide
shuffle, the other dominant workload class of the engine besides the
iterative joins PageRank evidences.  Appends a section to
BENCH/BASELINE.md (below the generator-owned part).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from dachshund_spark.session import get_spark

out_dir, sf_dir, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = get_spark(app_name="scaling_gen_docs", master="local[32]",
                  shuffle_partitions=64)
docs = spark.read.parquet(sf_dir + "/documents.parquet").select("doc_id", "text")
cp = spark.range(copies).select(F.col("id").alias("c"))
big = docs.crossJoin(cp).select(
    (F.col("doc_id") + 1000000 * F.col("c")).alias("doc_id"),
    # perturb each copy so gram buckets stay corpus-shaped instead of
    # inflating every group by exactly `copies`
    F.concat(F.col("text"), F.lit(" #"), F.col("c").cast("string")).alias("text"),
)
big.repartition(64, "doc_id").write.mode("overwrite").parquet(out_dir)
print("GENERATED", spark.read.parquet(out_dir).count())
"""

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from dachshund_spark.session import get_spark
from dachshund_spark.pipeline.dedup import duplicate_spans

cores, pq_dir = int(sys.argv[1]), sys.argv[2]
spark = get_spark(app_name=f"scaling_dedup_{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=max(cores * 2, 8))
docs = spark.read.parquet(pq_dir)
n_chars = docs.agg(F.sum(F.length("text"))).collect()[0][0]
# warmup: smaller k (fewer grams) exercises the same plan/codegen
duplicate_spans(docs.limit(50000), k=32).agg(F.count(F.lit(1))).collect()
t0 = time.time()
got = duplicate_spans(docs, k=32).agg(
    F.count(F.lit(1)).alias("n_spans"),
    F.sum("n_occurrences").alias("occ"),
).collect()[0]
dt = time.time() - t0
print(json.dumps({{"cores": cores, "chars": int(n_chars),
                  "n_dup_spans": int(got.n_spans),
                  "seconds": round(dt, 3),
                  "chars_per_sec": round(n_chars / dt, 1)}}))
"""


def _run(code: str, args: list[str]) -> str:
    out = subprocess.run(
        [sys.executable, "-c", code, *args], capture_output=True, text=True,
        timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(f"subprocess failed:\n{out.stderr[-3000:]}")
    return out.stdout


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    copies = int(os.environ.get("SCALING_COPIES", "64"))
    low_cores = int(os.environ.get("SCALING_LOW", "2"))
    high_cores = int(os.environ.get("SCALING_HIGH", "8"))

    cleanup = tempfile.mkdtemp(prefix="scaling_docs_")
    pq_dir = os.path.join(cleanup, "docs")
    try:
        _run(GEN.format(repo=repo), [pq_dir, sf_dir, str(copies)])
        results = {}
        for name, cores in (("low", low_cores), ("high", high_cores)):
            out = _run(RUNNER.format(repo=repo), [str(cores), pq_dir])
            lines = [l for l in out.strip().splitlines() if l.startswith("{")]
            results[name] = json.loads(lines[-1])
        low, high = results["low"], results["high"]
    finally:
        shutil.rmtree(cleanup, ignore_errors=True)

    ratio = high_cores / low_cores
    eff = (high["chars_per_sec"] / low["chars_per_sec"]) / ratio
    md = os.path.join(repo, "BENCH", "BASELINE.md")
    section = (
        "\n## Second workload: ExactSubstr gram hashing (dedup pipeline)\n\n"
        "duplicate_spans(k=32) — posexplode every 32-char window, md5,\n"
        "one groupBy shuffle — the CPU-bound columnar workload class,\n"
        f"complementing PageRank's iterative joins. Input: sf0.1 documents\n"
        f"replicated ×{copies} with per-copy text perturbation (gram buckets\n"
        "stay corpus-shaped), written once as parquet; fresh subprocess per\n"
        "core count; warmed up before timing.\n\n"
        "| config | corpus chars | dup spans | seconds | chars/sec |\n"
        "|---|---|---|---|---|\n"
        f"| local[{low_cores}] (N) | {low['chars']} | {low['n_dup_spans']} | "
        f"{low['seconds']} | {low['chars_per_sec']} |\n"
        f"| local[{high_cores}] (4N) | {high['chars']} | {high['n_dup_spans']} | "
        f"{high['seconds']} | {high['chars_per_sec']} |\n\n"
        f"**Per-core-normalized scaling efficiency** = "
        f"(chars/sec@{high_cores} ÷ chars/sec@{low_cores}) ÷ {ratio:.0f} = "
        f"**{eff:.3f}**\n"
    )
    marker = "## Second workload: ExactSubstr gram hashing"
    old = open(md).read() if os.path.exists(md) else ""
    if marker in old:
        head, _, tail = old.partition("\n## Second workload: ExactSubstr gram hashing")
        # drop the old section up to the next heading
        rest = tail.partition("\n## ")[2]
        old = head + ("\n## " + rest if rest else "")
    with open(md, "a" if marker not in old else "w") as fh:
        if marker in old:
            fh.write(old)
        fh.write(section)
    print(json.dumps({"efficiency": round(eff, 3), "low": low, "high": high}))


if __name__ == "__main__":
    main()
