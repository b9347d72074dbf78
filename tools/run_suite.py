"""Sharded full-suite gate (VERDICT r4 #8): the 600-test suite grew to
~40-47 min single-process; pytest-xdist is not in the environment, so
this runs N concurrent pytest processes over a greedy file-balanced
split.  Each shard is its own JVM with its own warehouse dir
(SPARK_GRAFT_WAREHOUSE — see session.py) so bucketed-table DDL can't
race; Spark's per-JVM temp dirs are uuid-named already.

Usage: python tools/run_suite.py [nshards] [extra pytest args...]
Exit code: 0 iff every shard passed.  Per-shard logs land in
/tmp/suite_shard_<i>.log; a combined tail prints on failure.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# duration proxies (seconds, from a single-process run) for files that
# a naive size heuristic misbalances; everything else uses line count
KNOWN_HEAVY = {
    "test_resume.py": 400,
    "test_plan_red_flags.py": 300,
    "test_plans.py": 240,
    "test_streaming.py": 240,
    "test_local_pack.py": 200,
    "test_pipeline.py": 180,
}


def _weight(path: str) -> float:
    base = os.path.basename(path)
    if base in KNOWN_HEAVY:
        return float(KNOWN_HEAVY[base])
    with open(path) as fh:
        return sum(1 for _ in fh) / 10.0


def shard_files(n: int) -> list[list[str]]:
    tests_dir = os.path.join(REPO, "tests")
    files = sorted(
        os.path.join(tests_dir, f)
        for f in os.listdir(tests_dir)
        if f.startswith("test_") and f.endswith(".py")
    )
    bins: list[tuple[float, list[str]]] = [(0.0, []) for _ in range(n)]
    for f in sorted(files, key=_weight, reverse=True):
        i = min(range(n), key=lambda j: bins[j][0])
        w, fs = bins[i]
        bins[i] = (w + _weight(f), fs + [f])
    return [fs for _, fs in bins]


def main() -> int:
    args = sys.argv[1:]
    n = int(args[0]) if args and args[0].isdigit() else 4
    extra = args[1:] if args and args[0].isdigit() else args
    shards = shard_files(n)
    procs = []
    t0 = time.time()
    for i, files in enumerate(shards):
        log = open(f"/tmp/suite_shard_{i}.log", "w")
        env = dict(os.environ)
        env["SPARK_GRAFT_WAREHOUSE"] = tempfile.mkdtemp(
            prefix=f"suite_wh_{i}_"
        )
        p = subprocess.Popen(
            [sys.executable, "-m", "pytest", "-q", *extra, *files],
            cwd=REPO,
            stdout=log,
            stderr=subprocess.STDOUT,
            env=env,
        )
        procs.append((p, log, files))
        print(f"shard {i}: {len(files)} files -> /tmp/suite_shard_{i}.log")
    rc = 0
    for i, (p, log, files) in enumerate(procs):
        code = p.wait()
        log.close()
        tail = open(f"/tmp/suite_shard_{i}.log").read().strip().split("\n")
        summary = tail[-1] if tail else ""
        print(f"shard {i}: exit {code} — {summary}")
        if code != 0:
            rc = 1
            print("\n".join(tail[-30:]))
    print(f"total wall: {time.time() - t0:.0f}s, exit {rc}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
