"""Instrumented N-vs-4N scaling probe (round 2).

Runs the 2M-turn pipeline count at a given parallelism with the Spark
event log enabled, then parses per-stage wall-clock + task-time totals
from the event log so the local[8] vs local[32] delta can be attributed
stage-by-stage (scan/heuristics, conv-stats agg, model UDF, dedup window).

Usage:
    taskset -c 0-7  python tools/scaling_probe3.py 8
    taskset -c 0-31 python tools/scaling_probe3.py 32

Prints PROBE_RESULT <json> with {cpus, cold, steadies, stages: [...]}.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

EVDIR = REPO / "data" / "tmp" / "eventlog"


def _event_lines(path: Path):
    """Yield event-log lines from a single-file log or the v2 rolling
    directory format (eventlog_v2_*/events_N_*), decompressing .zstd."""
    files = sorted(path.glob("events_*")) if path.is_dir() else [path]
    for f in files:
        if f.suffix == ".zstd":
            import io
            import subprocess

            raw = subprocess.run(
                ["zstd", "-d", "-c", str(f)], capture_output=True, check=True
            ).stdout
            yield from io.TextIOWrapper(io.BytesIO(raw))
        else:
            yield from f.open()


def parse_eventlog(path: Path) -> list[dict]:
    """Per-stage: wall (completion-submission), total task time, task count,
    max single task (straggler indicator)."""
    stages = {}
    task_time = defaultdict(float)
    task_count = defaultdict(int)
    task_max = defaultdict(float)
    gc_time = defaultdict(float)
    shuf_write = defaultdict(int)
    shuf_read = defaultdict(int)
    input_bytes = defaultdict(int)
    spill_bytes = defaultdict(int)
    for line in _event_lines(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        t = ev.get("Event")
        if t == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            sub = si.get("Submission Time")
            comp = si.get("Completion Time")
            if sub and comp:
                stages[sid] = {
                    "stage": sid,
                    "name": si.get("Stage Name", "")[:60],
                    "wall_s": round((comp - sub) / 1000, 2),
                    "n_tasks": si.get("Number of Tasks"),
                }
        elif t == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            tm = ev.get("Task Metrics") or {}
            rt = (tm.get("Executor Run Time") or 0) / 1000
            task_time[sid] += rt
            task_count[sid] += 1
            task_max[sid] = max(task_max[sid], rt)
            gc_time[sid] += (tm.get("JVM GC Time") or 0) / 1000
            sw = tm.get("Shuffle Write Metrics") or {}
            shuf_write[sid] += sw.get("Shuffle Bytes Written") or 0
            sr = tm.get("Shuffle Read Metrics") or {}
            shuf_read[sid] += (sr.get("Local Bytes Read") or 0) + (
                sr.get("Remote Bytes Read") or 0
            )
            im = tm.get("Input Metrics") or {}
            input_bytes[sid] += im.get("Bytes Read") or 0
            spill_bytes[sid] += tm.get("Disk Bytes Spilled") or 0
    out = []
    for sid, s in sorted(stages.items()):
        s["task_time_s"] = round(task_time[sid], 2)
        s["max_task_s"] = round(task_max[sid], 2)
        s["gc_s"] = round(gc_time[sid], 2)
        s["shuf_write_mb"] = round(shuf_write[sid] / 1e6, 1)
        s["shuf_read_mb"] = round(shuf_read[sid] / 1e6, 1)
        s["input_mb"] = round(input_bytes[sid] / 1e6, 1)
        s["spill_mb"] = round(spill_bytes[sid] / 1e6, 1)
        out.append(s)
    return out


def parse_jobs(path: Path) -> list[dict]:
    """Per-job wall time (job id, duration, stage ids) — lets cold/steady
    iterations be reconstructed from the event log alone."""
    starts = {}
    out = []
    for line in _event_lines(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") == "SparkListenerJobStart":
            starts[ev["Job ID"]] = (
                ev.get("Submission Time"),
                [s["Stage ID"] for s in ev.get("Stage Infos", [])],
            )
        elif ev.get("Event") == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            sub, sids = starts.get(jid, (None, []))
            comp = ev.get("Completion Time")
            if sub and comp:
                out.append(
                    {
                        "job": jid,
                        "wall_s": round((comp - sub) / 1000, 2),
                        "stages": sids,
                    }
                )
    return out


def main() -> None:
    cpus = int(sys.argv[1])
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    shutil.rmtree(EVDIR, ignore_errors=True)
    EVDIR.mkdir(parents=True, exist_ok=True)

    from fineweb_legal_spark.datasets import ensure_transcripts
    from fineweb_legal_spark.pipeline import run_pipeline
    from fineweb_legal_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]",
        app_name=f"probe3_{cpus}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": str(EVDIR),
        },
    )
    src = spark.read.parquet(str(ensure_transcripts("bench")))
    verdicts = run_pipeline(spark, src)

    # noop sink: materializes EVERY column (count() lets Catalyst prune the
    # dedup window + its exchange out of the plan entirely — measured: the
    # big stage had zero shuffle bytes)
    def run_once():
        verdicts.write.format("noop").mode("overwrite").save()

    rows = src.count()
    t0 = time.time()
    run_once()
    cold = time.time() - t0
    steadies = []
    for _ in range(reps):
        t0 = time.time()
        run_once()
        steadies.append(time.time() - t0)
    spark.stop()
    time.sleep(2)

    # timings FIRST (a parser bug must not eat the measurement)
    result = {
        "cpus": cpus,
        "rows": rows,
        "cold_sec": round(cold, 2),
        "steadies": [round(s, 2) for s in steadies],
        "turns_per_sec": round(rows / min(steadies), 1) if steadies else None,
    }
    print("PROBE_TIMING " + json.dumps(result), flush=True)
    logs = sorted(EVDIR.glob("*"), key=lambda p: p.stat().st_mtime)
    try:
        result["stages"] = parse_eventlog(logs[-1]) if logs else []
    except Exception as exc:  # noqa: BLE001
        result["stages"] = [{"parse_error": str(exc)[:200]}]
    print("PROBE_RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
