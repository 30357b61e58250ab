"""Fault-tolerance drive: SIGKILL a live executor mid-job on a real
standalone cluster and prove the job still converges bit-exact.

The reference's resilience story is single-process (S3 "auto-reconnect"
— reconnect a dropped DB connection and continue). The Spark analog has
two layers, and this drive evidences the one pytest can't reach:

- **executor loss → task retry** (this tool): a worker's executor JVM is
  SIGKILLed while the filter job runs; the standalone master relaunches
  an executor, lost tasks (and lost shuffle/cache blocks) are recomputed
  from lineage, and the SAME spark-submit invocation completes with
  exit 0 — no resume, no replay, output identical to golden.
- **driver/job loss → lineage resume** (jobs/run_filter.py kill/resume
  drive, COVERAGE.md): the whole job dies and a rerun skips committed
  buckets.

Protocol:
1. boot the 4-worker pinned cluster (tools/standalone_round topology)
2. spark-submit --py-files jobs/run_filter.py over the t2 corpus
   (60k turns, golden = 20,475 kept) with --groups 8
3. once executors are up and the job is mid-flight (first task output
   exists), SIGKILL ONE CoarseGrainedExecutorBackend process
4. assert: submit exits 0 AND the output equals golden exactly
   (row count, zero duplicate (conv_id, turn_idx), scrubbed-text
   equality via DuckDB full outer join)

Prints one JSON line; exit 0 iff the kill landed and the output is
exact. Run: python tools/executor_kill_drive.py
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from standalone_round import (  # noqa: E402
    MASTER_URL,
    _spark_home,
    _start_cluster,
    _stop_cluster,
)


def _executor_pids() -> list[int]:
    out = subprocess.run(
        ["pgrep", "-f", "CoarseGrainedExecutorBackend"],
        capture_output=True,
        text=True,
    )
    return [int(p) for p in out.stdout.split()]


def main() -> int:
    from fineweb_legal_spark.datasets import ensure_golden, ensure_transcripts

    input_pq = ensure_transcripts("t2")
    golden_pq = ensure_golden("t2")

    outdir = Path("/tmp/executor_kill_drive")
    subprocess.run(["rm", "-rf", str(outdir)], check=True)
    logdir = REPO / "data" / "standalone_logs"
    sh = _spark_home()
    blocks = ["0-7", "8-15", "16-23", "24-31"]
    procs = _start_cluster(blocks, logdir)
    killed_pid = None
    rc = None
    try:
        env = dict(os.environ)
        env["SPARK_HOME"] = str(sh)
        env["PYSPARK_PYTHON"] = sys.executable
        env["PYSPARK_DRIVER_PYTHON"] = sys.executable
        submit = subprocess.Popen(
            [
                str(sh / "bin" / "spark-submit"),
                "--master", MASTER_URL,
                "--py-files", str(REPO / "dist" / "fineweb_legal_spark.zip"),
                "--driver-memory", "6g",
                "--executor-cores", "4",
                "--executor-memory", "4g",
                "--conf", "spark.cores.max=32",
                "--conf", "spark.executor.extraJavaOptions=-Xms4g",
                "--conf", "spark.ui.enabled=false",
                str(REPO / "jobs" / "run_filter.py"),
                "--input", str(input_pq),
                "--output", str(outdir),
                "--groups", "8",
                # run_filter builds its session via get_spark, whose
                # local[N] default would override spark-submit's master
                "--master", MASTER_URL,
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=str(REPO),
        )
        # wait until the job is genuinely mid-flight: executors registered
        # AND the first committed output exists (so the kill can also cost
        # already-produced map output, not just queued tasks)
        deadline = time.time() + 600
        while time.time() < deadline:
            pids = _executor_pids()
            if pids and (outdir / "data").exists():
                killed_pid = pids[0]
                os.kill(killed_pid, signal.SIGKILL)
                break
            if submit.poll() is not None:
                break
            time.sleep(0.5)
        try:
            out, _ = submit.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            submit.kill()
            out, _ = submit.communicate()
        rc = submit.returncode
        (logdir / "executor_kill_submit.log").write_text(out[-30000:])
    finally:
        _stop_cluster(procs)

    # exactness vs golden, engine-independent (DuckDB over the parquet)
    import duckdb

    con = duckdb.connect()
    q = f"""
    WITH got AS (
        SELECT conv_id, turn_idx, scrubbed_text
        FROM read_parquet('{outdir}/data/*/*.parquet', hive_partitioning=1)
    ),
    want AS (
        SELECT conv_id, turn_idx, scrubbed_text
        FROM read_parquet('{golden_pq}') WHERE keep
    )
    SELECT
        (SELECT count(*) FROM got) AS got_rows,
        (SELECT count(*) FROM want) AS want_rows,
        (SELECT count(*) FROM (SELECT conv_id, turn_idx FROM got
                               GROUP BY 1, 2 HAVING count(*) > 1)) AS dup_keys,
        (SELECT count(*) FROM got g FULL OUTER JOIN want w
            USING (conv_id, turn_idx)
         WHERE g.conv_id IS NULL OR w.conv_id IS NULL
            OR g.scrubbed_text IS DISTINCT FROM w.scrubbed_text) AS mismatches
    """
    got_rows, want_rows, dup_keys, mismatches = con.execute(q).fetchone()
    ok = (
        rc == 0
        and killed_pid is not None
        and got_rows == want_rows
        and dup_keys == 0
        and mismatches == 0
    )
    print(
        json.dumps(
            {
                "metric": "executor_kill_drive",
                "ok": ok,
                "submit_rc": rc,
                "killed_executor_pid": killed_pid,
                "got_rows": got_rows,
                "want_rows": want_rows,
                "dup_keys": dup_keys,
                "mismatches": mismatches,
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
