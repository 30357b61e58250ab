"""Deployment-invariance drive for the streaming catalog-table sink:
the SAME streaming job (availableNow, checkpointed, batch-id idempotent
commits) run once on local[8] and once on the real 4-worker standalone
cluster must produce bit-identical tables.

Equality must be asserted at the CONTRACT level, not row identity:
`dropDuplicatesWithinWatermark` is documented first-arrival-wins, and
"first arrival" within a micro-batch is task-completion order — the
surviving MEMBER of a duplicate cluster legitimately differs between
local[8] and a 32-core cluster (measured: 732 of 16,666 rows), while
the surviving norm_key SET does not. Checks:

1. both runs exit 0, equal row counts, zero duplicate (conv_id,
   turn_idx) keys in each
2. the surviving norm_key SETS are identical (norm_key recomputed from
   the joined-back input via the package's own normalizer) — one
   survivor per key, same keys, both deployments
3. rows present under the SAME key in both runs have byte-equal
   scrubbed_text (scrub is per-row deterministic)
4. zero quality leaks: every emitted row is either golden-kept or
   golden-rejected ONLY for the two documented stream contract gaps —
   'duplicate' (winner identity, see above) or 'conv_stats' (the
   stream runs per-turn heuristics without the conversation-stats
   stage, filter_stream.py module docstring) — and the conv_stats
   count is EQUAL across deployments (it is deterministic; measured
   33 both sides)

Prints one JSON line; exit 0 iff all pass.
Run: python tools/cluster_stream_drive.py   (no other Spark jobs up)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
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

BASE = Path("/tmp/cluster_stream_drive")


def _prep_input() -> Path:
    """t2 as a 20-file directory (FileStreamSource tails directories; >1
    file per trigger batch exercises multi-batch commits)."""
    import pyarrow.parquet as pq

    from fineweb_legal_spark.datasets import ensure_transcripts

    src = BASE / "input"
    src.mkdir(parents=True)
    t = pq.read_table(ensure_transcripts("t2"))
    n_files = 20
    step = (t.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        part = t.slice(i * step, step)
        if part.num_rows:
            pq.write_table(part, src / f"part-{i:02d}.parquet")
    return src


def _submit(sh: Path, master: str, src: Path, wh: Path, ckpt: Path) -> int:
    env = dict(os.environ)
    env["SPARK_HOME"] = str(sh)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    cmd = [
        str(sh / "bin" / "spark-submit"),
        "--master", master,
        "--py-files", str(REPO / "dist" / "fineweb_legal_spark.zip"),
        "--driver-memory", "6g",
    ]
    if master.startswith("spark://"):
        cmd += [
            "--executor-cores", "4",
            "--executor-memory", "4g",
            "--conf", "spark.cores.max=32",
            "--conf", "spark.executor.extraJavaOptions=-Xms4g",
        ]
    cmd += [
        "--conf", "spark.ui.enabled=false",
        str(REPO / "jobs" / "run_filter.py"),
        "--input", str(src),
        "--streaming",
        "--output-table", "streamed",
        "--warehouse", str(wh),
        "--checkpoint", str(ckpt),
        "--master", master,
    ]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=1500, env=env, cwd=str(REPO)
    )
    (REPO / "data" / "standalone_logs" / f"stream_{'cluster' if 'spark:' in master else 'local'}.log").write_text(
        proc.stdout[-15000:] + "\n--- stderr ---\n" + proc.stderr[-15000:]
    )
    return proc.returncode


def main() -> int:
    from fineweb_legal_spark.datasets import ensure_golden

    golden_pq = ensure_golden("t2")
    subprocess.run(["rm", "-rf", str(BASE)], check=True)
    src = _prep_input()
    sh = _spark_home()

    rc_local = _submit(
        sh, "local[8]", src, BASE / "wh_local", BASE / "ckpt_local"
    )

    procs = _start_cluster(
        ["0-7", "8-15", "16-23", "24-31"], REPO / "data" / "standalone_logs"
    )
    try:
        rc_cluster = _submit(
            sh, MASTER_URL, src, BASE / "wh_cluster", BASE / "ckpt_cluster"
        )
    finally:
        _stop_cluster(procs)

    import duckdb

    from fineweb_legal_spark.textstats import norm_hash

    con = duckdb.connect()
    inp = con.execute(
        f"SELECT conv_id, turn_idx, text FROM read_parquet('{src}/*.parquet')"
    ).df()
    inp["norm_key"] = [
        norm_hash(t) if isinstance(t, str) else None for t in inp["text"]
    ]
    con.register("inp", inp)
    q = f"""
    WITH loc AS (
        SELECT conv_id, turn_idx, scrubbed_text
        FROM read_parquet('{BASE}/wh_local/streamed/*/*.parquet',
                          hive_partitioning=1)
    ),
    clu AS (
        SELECT conv_id, turn_idx, scrubbed_text
        FROM read_parquet('{BASE}/wh_cluster/streamed/*/*.parquet',
                          hive_partitioning=1)
    ),
    gold AS (
        SELECT conv_id, turn_idx, keep, reject_reason
        FROM read_parquet('{golden_pq}')
    ),
    lk AS (SELECT i.norm_key FROM loc l JOIN inp i USING (conv_id, turn_idx)),
    ck AS (SELECT i.norm_key FROM clu c JOIN inp i USING (conv_id, turn_idx))
    SELECT
        (SELECT count(*) FROM loc),
        (SELECT count(*) FROM clu),
        (SELECT count(*) FROM (SELECT conv_id, turn_idx FROM loc
                               GROUP BY 1, 2 HAVING count(*) > 1)),
        (SELECT count(*) FROM (SELECT conv_id, turn_idx FROM clu
                               GROUP BY 1, 2 HAVING count(*) > 1)),
        (SELECT count(*) FROM (SELECT norm_key FROM lk
                               EXCEPT SELECT norm_key FROM ck))
      + (SELECT count(*) FROM (SELECT norm_key FROM ck
                               EXCEPT SELECT norm_key FROM lk)),
        (SELECT count(*) FROM loc l JOIN clu c USING (conv_id, turn_idx)
         WHERE l.scrubbed_text IS DISTINCT FROM c.scrubbed_text),
        (SELECT count(*) FROM clu c JOIN gold g USING (conv_id, turn_idx)
         WHERE NOT g.keep
           AND g.reject_reason NOT IN ('duplicate', 'conv_stats')),
        (SELECT count(*) FROM clu c ANTI JOIN gold g
            USING (conv_id, turn_idx)),
        (SELECT count(*) FROM loc l JOIN gold g USING (conv_id, turn_idx)
         WHERE NOT g.keep AND g.reject_reason = 'conv_stats'),
        (SELECT count(*) FROM clu c JOIN gold g USING (conv_id, turn_idx)
         WHERE NOT g.keep AND g.reject_reason = 'conv_stats')
    """
    (
        loc_rows, clu_rows, dup_loc, dup_clu, key_set_diff,
        shared_text_mismatch, leaks, unknown_rows, cs_loc, cs_clu,
    ) = con.execute(q).fetchone()
    ok = (
        rc_local == 0
        and rc_cluster == 0
        and loc_rows > 0
        and loc_rows == clu_rows
        and dup_loc == 0
        and dup_clu == 0
        and key_set_diff == 0
        and shared_text_mismatch == 0
        and leaks == 0
        and unknown_rows == 0
        and cs_loc == cs_clu
    )
    print(
        json.dumps(
            {
                "metric": "cluster_stream_drive",
                "ok": ok,
                "rc_local": rc_local,
                "rc_cluster": rc_cluster,
                "rows": [loc_rows, clu_rows],
                "dup_keys": [dup_loc, dup_clu],
                "norm_key_set_diff": key_set_diff,
                "shared_key_text_mismatches": shared_text_mismatch,
                "quality_leaks": leaks,
                "rows_not_in_golden": unknown_rows,
                "conv_stats_gap_rows": [cs_loc, cs_clu],
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
