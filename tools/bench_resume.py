"""Kill-resume bench at scaling-fixture scale (VERDICT r3 #8).

Proves the durable-checkpoint protocol at ~2.3×10^8 edges, launched
through the real `spark-submit --py-files` path the north rule names:

1. generate (or reuse via SCALING_EDGES_DIR) the 512-copy derived
   edge table from tools/bench_scaling.py (~233M edges);
2. run A: `spark-submit tools/resume_job.py` with durable
   checkpointing, SIGKILL the whole process group mid-superstep once
   the first snapshot commit appears in meta.jsonl;
3. run B: re-submit the identical command — resumes from the last
   committed superstep and spends only the remaining budget;
4. run C: uninterrupted reference run (fresh checkpoint dir,
   identical command);
5. compare B vs C per-vertex in DuckDB (exact-equality count + max
   abs diff) and append the evidence section to BENCH/BASELINE.md.

Usage: python tools/bench_resume.py  (env: SCALING_EDGES_DIR to reuse
an existing edge table, RESUME_ITERS / RESUME_CORES to resize).
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "/opt/spark/bin/spark-submit")


def _gen_edges(pq_dir: str, sf_dir: str, copies: int) -> None:
    # same fixture as the scaling bench
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_scaling", os.path.join(REPO, "tools", "bench_scaling.py")
    )
    bs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bs)
    GEN = bs.GEN

    out = subprocess.run(
        [sys.executable, "-c", GEN.format(repo=REPO), pq_dir, sf_dir, str(copies)],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(f"edge gen failed:\n{out.stderr[-3000:]}")


def _submit(cores: int, zip_path: str, args: list[str]) -> subprocess.Popen:
    cmd = [
        SPARK_SUBMIT,
        "--master",
        f"local[{cores}]",
        "--conf",
        f"spark.sql.shuffle.partitions={cores * 2}",
        "--conf",
        "spark.ui.showConsoleProgress=false",
        "--driver-memory",
        "16g",
        "--py-files",
        zip_path,
        os.path.join(REPO, "tools", "resume_job.py"),
        *args,
    ]
    return subprocess.Popen(
        cmd,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,  # killpg takes the JVM down with the driver
        cwd=REPO,
    )


def _run_to_completion(cores: int, zip_path: str, args: list[str]) -> dict:
    proc = _submit(cores, zip_path, args)
    out, _ = proc.communicate(timeout=3600)
    if proc.returncode != 0:
        raise RuntimeError(f"spark-submit failed rc={proc.returncode}\n{out[-3000:]}")
    line = [l for l in out.splitlines() if l.startswith("RESUME_JOB ")][-1]
    return json.loads(line[len("RESUME_JOB "):])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    iters = int(os.environ.get("RESUME_ITERS", "8"))
    cores = int(os.environ.get("RESUME_CORES", "16"))
    copies = int(os.environ.get("SCALING_COPIES", "512"))
    kill_grace = float(os.environ.get("RESUME_KILL_GRACE", "15"))

    work = tempfile.mkdtemp(prefix="bench_resume_")
    pq_dir = os.environ.get("SCALING_EDGES_DIR")
    if pq_dir is None:
        pq_dir = os.path.join(work, "edges")
        print(f"generating {copies}-copy edge table ...", flush=True)
        _gen_edges(pq_dir, sf_dir, copies)

    zip_path = os.path.join(work, "dachshund_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles_zip.py"), zip_path],
        check=True,
        capture_output=True,
    )

    ckpt_ab = os.path.join(work, "ckpt_ab")
    ckpt_c = os.path.join(work, "ckpt_c")
    out_b = os.path.join(work, "scores_resumed")
    out_c = os.path.join(work, "scores_reference")
    meta = os.path.join(ckpt_ab, "meta.jsonl")

    try:
        # --- run A: kill mid-superstep after the first durable commit
        print("run A (to be killed) ...", flush=True)
        proc = _submit(cores, zip_path, [pq_dir, ckpt_ab, out_b, str(iters)])
        t0 = time.time()
        while not os.path.exists(meta) or not open(meta).read().strip():
            if proc.poll() is not None:
                raise RuntimeError("run A exited before first commit")
            if time.time() - t0 > 1800:
                raise RuntimeError("run A never committed a snapshot")
            time.sleep(1)
        time.sleep(kill_grace)  # land the SIGKILL inside a later superstep
        os.killpg(proc.pid, signal.SIGKILL)
        kill_t = round(time.time() - t0, 1)
        # snapshot the committed list AFTER the kill: commits landing
        # during the grace window belong in the pre-kill evidence.  The
        # kill can land mid-write — skip a torn trailing line.
        committed = []
        for l in open(meta):
            if l.strip():
                try:
                    committed.append(json.loads(l)["superstep"])
                except json.JSONDecodeError:
                    pass
        print(
            f"  killed A at t={kill_t}s with supersteps {committed} committed",
            flush=True,
        )

        # --- run B: identical command resumes from the snapshot
        print("run B (resume) ...", flush=True)
        res_b = _run_to_completion(cores, zip_path, [pq_dir, ckpt_ab, out_b, str(iters)])
        assert res_b["resumed_from_superstep"] is not None, "B did not resume"

        # --- run C: uninterrupted reference
        print("run C (reference) ...", flush=True)
        res_c = _run_to_completion(cores, zip_path, [pq_dir, ckpt_c, out_c, str(iters)])

        # --- compare per-vertex scores
        import duckdb

        con = duckdb.connect()
        cmp = con.execute(
            f"""
            SELECT COUNT(*) AS rows,
                   SUM(CASE WHEN b.pagerank = c.pagerank THEN 1 ELSE 0 END) AS bit_equal,
                   MAX(ABS(b.pagerank - c.pagerank)) AS max_abs_diff
            FROM read_parquet('{out_b}/*.parquet') b
            JOIN read_parquet('{out_c}/*.parquet') c ON b.node_id = c.node_id
            """
        ).fetchone()
        rows, bit_equal, max_diff = cmp
        n_edges = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{pq_dir}/*.parquet')"
        ).fetchone()[0]
        result = {
            "edges": n_edges,
            "iters": iters,
            "cores": cores,
            "killed_at_s": kill_t,
            "committed_before_kill": committed,
            "resumed_from_superstep": res_b["resumed_from_superstep"],
            "history_after_resume": res_b["committed_supersteps"],
            "resume_seconds": res_b["seconds"],
            "reference_seconds": res_c["seconds"],
            "vertices": rows,
            "bit_equal_vertices": bit_equal,
            "max_abs_diff": max_diff,
            "allclose_1e6": (max_diff or 0.0) <= 1e-6,
        }
        print(json.dumps(result), flush=True)
        assert result["allclose_1e6"], "resumed scores diverged beyond 1e-6"

        md = os.path.join(REPO, "BENCH", "BASELINE.md")
        section = (
            "\n## Kill-resume at bench scale (round 4)\n\n"
            "Durable-checkpoint crash recovery at the scaling fixture's\n"
            f"size, launched via `spark-submit --py-files dachshund_spark.zip\n"
            f"tools/resume_job.py` at local[{cores}] ({n_edges:,} edges,\n"
            f"{iters} fixed PageRank supersteps, snapshot-per-5-supersteps):\n\n"
            f"- run A SIGKILLed (whole process group) at t={kill_t}s, mid-\n"
            f"  superstep, with supersteps {committed} durably committed;\n"
            f"- run B (identical resubmit) resumed from superstep\n"
            f"  {res_b['resumed_from_superstep']}, spent only the remaining\n"
            f"  budget ({res_b['seconds']}s vs the uninterrupted reference's\n"
            f"  {res_c['seconds']}s), final history {res_b['committed_supersteps']};\n"
            f"- per-vertex scores vs the uninterrupted run C: {bit_equal:,} of\n"
            f"  {rows:,} vertices bit-identical, max |Δ| = {max_diff!r}\n"
            f"  (north-rule allclose 1e-6: PASS).\n"
        )
        old = open(md).read() if os.path.exists(md) else ""
        marker = "\n## Kill-resume at bench scale (round 4)\n"
        if marker in old:  # replace a previous run's section in place
            head, _, tail = old.partition(marker)
            rest = tail.split("\n## ", 1)
            old = head + ("\n## " + rest[1] if len(rest) > 1 else "")
        with open(md, "w") as fh:
            fh.write(old + section)
        print(f"wrote section to {md}", flush=True)
    finally:
        # an external SCALING_EDGES_DIR lives outside work and survives
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
