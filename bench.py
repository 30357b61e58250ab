"""Benchmark harness. Prints ONE JSON line:

{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": <float>,
 "pipeline": {rows, cold_sec, steady_sec, turns_per_sec},
 "scaling": {"local[8]": {...}, "local[32]": {...}, "efficiency": e}}

- headline queries run at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
  on local[$SPARK_GRAFT_CPUS]
- the transcript pipeline runs over the 2M-turn bench tier
- scaling evidence (BASELINE.json north_rule: N vs 4N executors) is the
  same pipeline job on identical input at local[8] vs local[32] in child
  processes; efficiency = (thr_32 / thr_8) / (32 / 8)

Steady-state timing re-executes the SAME DataFrame: the first execution of
each fresh plan pays one-time Janino codegen (10-60 s in this sandbox),
which a long-running cluster job pays once per stage, not per partition.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

HEADLINE = (
    "pipeline_verdicts",
    "web_filter_verdicts",
    "sum_avg_lineitem",
    "window_first_events",
    "dedup_exact_docs",
    "embedding_topk_cosine",
    "top_sources_docs",
)


def _count(df) -> int:
    return df.count()


def _pipeline_bench(spark) -> dict:
    from fineweb_legal_spark.datasets import ensure_transcripts
    from fineweb_legal_spark.pipeline import run_pipeline

    src = spark.read.parquet(str(ensure_transcripts("bench")))
    verdicts = run_pipeline(spark, src)
    t0 = time.time()
    rows = _count(verdicts)
    cold = time.time() - t0
    # best-of-3 steady-state: this sandbox is a Firecracker microVM with
    # invisible noisy-neighbor host contention (observed 4x run-to-run
    # swings); min-of-N is the standard de-noising for such hosts
    steadies = []
    for _ in range(int(os.environ.get("BENCH_REPS", "3"))):
        t0 = time.time()
        _count(verdicts)
        steadies.append(time.time() - t0)
    steady = min(steadies)
    return {
        "rows": rows,
        "cold_sec": round(cold, 2),
        "steady_sec": round(steady, 2),
        "steady_all": [round(s, 2) for s in steadies],
        "turns_per_sec": round(rows / steady, 1),
    }


def scaling_child(cpus: int) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    os.environ.setdefault("BENCH_REPS", "3")
    from fineweb_legal_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name=f"bench_scaling_{cpus}")
    out = _pipeline_bench(spark)
    print("SCALING_RESULT " + json.dumps(out))
    spark.stop()


def _run_scaling() -> dict:
    """N vs 4N scaling stand-in (BASELINE.md): each child is PINNED to
    exactly N physical cores with taskset, otherwise the local[8] run's
    Python UDF workers would still spread over all 32 cores and inflate the
    small-cluster baseline."""
    results = {}
    for cpus in (8, 32):
        cmd = [sys.executable, __file__, "--scaling-child", str(cpus)]
        import shutil as _sh

        if _sh.which("taskset"):
            cmd = ["taskset", "-c", f"0-{cpus - 1}", *cmd]
        proc = subprocess.run(
            cmd,
            capture_output=True,
            text=True,
            timeout=2700,
            cwd=str(REPO),
        )
        for line in proc.stdout.splitlines():
            if line.startswith("SCALING_RESULT "):
                results[f"local[{cpus}]"] = json.loads(line.split(" ", 1)[1])
                break
        else:
            results[f"local[{cpus}]"] = {"error": proc.stderr[-500:]}
    try:
        t8 = results["local[8]"]["turns_per_sec"]
        t32 = results["local[32]"]["turns_per_sec"]
        results["efficiency"] = round((t32 / t8) / (32 / 8), 3)
    except (KeyError, ZeroDivisionError, TypeError):
        results["efficiency"] = None
    return results


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--scaling-child":
        scaling_child(int(sys.argv[2]))
        return
    if len(sys.argv) >= 2 and sys.argv[1] == "--scaling-only":
        from fineweb_legal_spark.datasets import ensure_transcripts

        ensure_transcripts("bench")
        print(json.dumps({"scaling": _run_scaling()}))
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.0
    skip_scaling = os.environ.get("BENCH_SKIP_SCALING") == "1"

    # generate bench data up front (one-time, cached on disk)
    from fineweb_legal_spark.datasets import ensure_transcripts

    ensure_transcripts("bench")

    from fineweb_legal_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="bench")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        t0 = time.time()
        _count(qs[name](spark, sf_dir))
        el = time.time() - t0
        timings[name] = round(el, 2)
        total += el

    pipeline = _pipeline_bench(spark)
    total += pipeline["steady_sec"]
    spark.stop()

    scaling = {} if skip_scaling else _run_scaling()

    print(
        json.dumps(
            {
                "metric": "headline-suite wall-clock (sf tables + 2M-turn "
                "quality-filter pipeline; steady-state)",
                "value": round(total, 2),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "pipeline": pipeline,
                "scaling": scaling,
            }
        )
    )


if __name__ == "__main__":
    main()
