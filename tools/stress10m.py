"""10M-row scale-stress of the round-4 Arrow/window kernels (r4 verdict
item 6): ``scrub_repeated_spans`` at its min_docs=2 worst case,
``repetition_signals``, and ``prefix_dedup_pairs`` on the 10M-turn
``bench10`` tier — the same class of probe whose 2M-row seqpack run
caught two real prefix-sum bugs in round 4.

Each operator runs on the 2M ``bench`` tier and the 10M ``bench10``
tier (cold + steady noop write; steady = min of BENCH_REPS re-runs of
the SAME DataFrame so Janino codegen is excluded), and the line reports
per-row linearity: ratio = (rows10/rows2) adjusted wall-clock ratio,
~<=1.0 meaning 5x data costs <= 5x time (no super-linear stage).

Usage: python tools/stress10m.py [op ...]   (default: all three)
Appends to data/stress10_cache.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
CACHE = REPO / "data" / "stress10_cache.json"


def _frames(spark, tier: str):
    from pyspark.sql import functions as F

    from fineweb_legal_spark.datasets import ensure_transcripts

    t = spark.read.parquet(str(ensure_transcripts(tier)))
    # per-row unique id for the doc-keyed kernels
    docs = t.select(
        F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string")).alias(
            "doc_id"
        ),
        "text",
    )
    return t, docs


def _build(spark, name: str, tier: str):
    from fineweb_legal_spark.operators.prefixdedup import prefix_dedup_pairs
    from fineweb_legal_spark.operators.spandedup import scrub_repeated_spans
    from fineweb_legal_spark.operators.textql import repetition_signals

    t, docs = _frames(spark, tier)
    if name == "repetition_signals":
        return repetition_signals(docs)
    if name == "scrub_repeated_spans":
        # min_docs=2 is the WORST case: the repeated-gram set is as
        # large as it can be, stressing the runtime broadcast-vs-shuffle
        # decision and the (id, pos) join-back
        return scrub_repeated_spans(docs, n=8, min_docs=2)
    if name == "prefix_dedup_pairs":
        return prefix_dedup_pairs(t)
    raise SystemExit(f"unknown op {name!r}")


def _time_op(spark, name: str, tier: str, reps: int) -> dict:
    df = _build(spark, name, tier)

    def run():
        df.write.format("noop").mode("overwrite").save()

    t0 = time.time()
    run()
    cold = time.time() - t0
    steadies = []
    for _ in range(reps):
        t0 = time.time()
        run()
        steadies.append(time.time() - t0)
    return {
        "cold_sec": round(cold, 2),
        "steady_sec": round(min(steadies) if steadies else cold, 2),
    }


def main() -> None:
    ops = sys.argv[1:] or [
        "repetition_signals",
        "scrub_repeated_spans",
        "prefix_dedup_pairs",
    ]
    reps = int(os.environ.get("BENCH_REPS", "2"))

    from fineweb_legal_spark.datasets import ensure_transcripts
    from fineweb_legal_spark.session import get_spark

    for tier in ("bench", "bench10"):
        ensure_transcripts(tier)
    spark = get_spark(master="local[32]", app_name="stress10m")
    rows = {
        tier: spark.read.parquet(
            str(ensure_transcripts(tier))
        ).count()
        for tier in ("bench", "bench10")
    }

    out: dict = {"metric": "10M-row kernel stress", "rows": rows, "ops": {}}
    for name in ops:
        rec = {}
        for tier in ("bench", "bench10"):
            rec[tier] = _time_op(spark, name, tier, reps)
            print(
                f"{name}/{tier}: cold {rec[tier]['cold_sec']}s "
                f"steady {rec[tier]['steady_sec']}s",
                file=sys.stderr,
                flush=True,
            )
        scale = rows["bench10"] / rows["bench"]
        rec["per_row_ratio"] = round(
            (rec["bench10"]["steady_sec"] / rec["bench"]["steady_sec"])
            / scale,
            3,
        )
        out["ops"][name] = rec
    spark.stop()

    try:
        hist = (
            json.loads(CACHE.read_text()) if CACHE.exists() else {"runs": []}
        )
    except (OSError, json.JSONDecodeError):
        hist = {"runs": []}
    hist["runs"].append(
        {**out, "at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    )
    CACHE.parent.mkdir(parents=True, exist_ok=True)
    CACHE.write_text(json.dumps(hist, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
