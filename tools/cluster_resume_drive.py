"""The north rule's output sentence, end to end, in one drive:

    "writes filtered output plus per-partition lineage and stage metrics
     back to Iceberg with checkpointed, idempotent per-partition commits
     so a killed run resumes without recomputation, launched via
     spark-submit --py-files on multi-executor clusters"

Every clause is exercised on a REAL standalone cluster (4 pinned
workers, 8 executors x 4 cores, separate JVMs):

1. spark-submit --py-files jobs/run_filter.py --output-table filtered
   --warehouse <wh> --groups 16 over the t2 corpus (catalog-table
   lineage backend: per-bucket dynamic-partition-overwrite commits, the
   Iceberg overwritePartitions path when that catalog is plugged in)
2. SIGKILL the DRIVER once >=2 bucket groups are lineage-committed
   (the whole app dies: driver, executors, in-flight tasks)
3. re-submit the identical command: the run reports committed_before>=1,
   recomputes only uncommitted groups against the SAME Derby-backed
   metastore, and exits 0
4. DuckDB full-outer-joins the final table's parquet against the golden
   kept set: row count, duplicate keys, scrubbed-text equality

Prints one JSON line; exit 0 iff the kill landed mid-run, the resume
skipped >=2 committed groups, and the output is bit-exact.
Run: python tools/cluster_resume_drive.py  (no other Spark jobs up)
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

WH = Path("/tmp/cluster_resume_drive/wh")


def _submit_cmd(sh: Path, input_pq: Path) -> list[str]:
    return [
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
        "--output-table", "filtered",
        "--warehouse", str(WH),
        "--groups", "16",
        "--master", MASTER_URL,
    ]


def _committed_buckets() -> int:
    # lineage rows are the commit points; the table is partitioned by
    # bucket, so committed work is visible as bucket=* dirs with data
    d = WH / "filtered_lineage"
    if not d.exists():
        return 0
    n = 0
    for sub in d.glob("bucket=*"):
        if any(f.suffix == ".parquet" for f in sub.iterdir()):
            n += 1
    return n


def main() -> int:
    from fineweb_legal_spark.datasets import ensure_golden, ensure_transcripts

    input_pq = ensure_transcripts("t2")
    golden_pq = ensure_golden("t2")
    subprocess.run(["rm", "-rf", str(WH.parent)], check=True)
    WH.mkdir(parents=True)

    sh = _spark_home()
    env = dict(os.environ)
    env["SPARK_HOME"] = str(sh)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    logdir = REPO / "data" / "standalone_logs"
    procs = _start_cluster(["0-7", "8-15", "16-23", "24-31"], logdir)
    committed_at_kill = 0
    resume = {}
    rc2 = None
    try:
        # --- run 1: kill the driver mid-commits -------------------------
        p1 = subprocess.Popen(
            _submit_cmd(sh, input_pq),
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            env=env,
            cwd=str(REPO),
            start_new_session=True,
        )
        deadline = time.time() + 900
        while time.time() < deadline and p1.poll() is None:
            committed_at_kill = _committed_buckets()
            if committed_at_kill >= 4:
                os.killpg(p1.pid, signal.SIGKILL)  # driver + its children
                break
            time.sleep(0.5)
        p1.wait(timeout=60)
        killed_mid_run = p1.poll() is not None and 0 < committed_at_kill < 32

        # --- run 2: identical command, must resume ----------------------
        proc = subprocess.run(
            _submit_cmd(sh, input_pq),
            capture_output=True,
            text=True,
            timeout=1200,
            env=env,
            cwd=str(REPO),
        )
        rc2 = proc.returncode
        (logdir / "cluster_resume_submit.log").write_text(
            proc.stdout[-20000:] + "\n--- stderr ---\n" + proc.stderr[-20000:]
        )
        for line in proc.stdout.splitlines():
            line = line.strip()
            if line.startswith("{") and "committed_before" in line:
                resume = json.loads(line)
                break
    finally:
        _stop_cluster(procs)

    import duckdb

    q = f"""
    WITH got AS (
        SELECT conv_id, turn_idx, scrubbed_text
        FROM read_parquet('{WH}/filtered/*/*.parquet', hive_partitioning=1)
    ),
    want AS (
        SELECT conv_id, turn_idx, scrubbed_text
        FROM read_parquet('{golden_pq}') WHERE keep
    )
    SELECT
        (SELECT count(*) FROM got),
        (SELECT count(*) FROM want),
        (SELECT count(*) FROM (SELECT conv_id, turn_idx FROM got
                               GROUP BY 1, 2 HAVING count(*) > 1)),
        (SELECT count(*) FROM got g FULL OUTER JOIN want w
            USING (conv_id, turn_idx)
         WHERE g.conv_id IS NULL OR w.conv_id IS NULL
            OR g.scrubbed_text IS DISTINCT FROM w.scrubbed_text)
    """
    got_rows, want_rows, dup_keys, mismatches = (
        duckdb.connect().execute(q).fetchone()
    )
    ok = (
        killed_mid_run
        and rc2 == 0
        and resume.get("committed_before", 0) >= 1
        and got_rows == want_rows
        and dup_keys == 0
        and mismatches == 0
    )
    print(
        json.dumps(
            {
                "metric": "cluster_resume_drive",
                "ok": ok,
                "committed_buckets_at_kill": committed_at_kill,
                "resume_committed_before": resume.get("committed_before"),
                "resume_rc": rc2,
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
