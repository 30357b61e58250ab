"""Data-size linearity probe: same pipeline, same cores, 1x vs 5x rows.

The north rule's scaling criterion is about CLUSTER width (N vs 4N
executors, evidenced by the taskset-pinned core-scaling rounds in
``tools/scaling_round.py``).  This probe evidences the orthogonal axis:
that the plan has no super-linear stage in DATA size.  It runs the full
filter pipeline (heuristics + salted conv-stats + langid/ppl + scrub +
global dedup, noop sink) at local[32] on the 2M-turn ``bench`` tier and
the 10M-turn ``bench10`` tier and reports per-turn throughput at both.
A flat turns/sec (ratio ~1.0) means 5x data costs 5x wall-clock — the
per-row cost curve a 10^12-turn run extrapolates along.  Sub-1.0 drift
would expose a hidden O(n log n)-or-worse stage (e.g. a sort that stops
fitting, a broadcast that grows with n).

Interleaved bench/bench10 rounds (like the core-scaling protocol) so a
slow host window hits both tiers; headline pairs best-per-tier.
Results append to ``data/linearity_cache.json``.

Usage: python tools/linearity_round.py [n_rounds]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
CACHE = REPO / "data" / "linearity_cache.json"


def _run_child(tier: str) -> dict | None:
    cmd = [
        sys.executable,
        str(REPO / "bench.py"),
        "--scaling-child",
        "32",
        tier,
    ]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=5400, cwd=str(REPO)
        )
    except subprocess.TimeoutExpired:
        print(f"child tier={tier} timed out", file=sys.stderr)
        return None
    for line in proc.stdout.splitlines():
        if line.startswith("SCALING_RESULT "):
            return json.loads(line.split(" ", 1)[1])
    print(f"child tier={tier} failed: {proc.stderr[-400:]}", file=sys.stderr)
    return None


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    cache = json.loads(CACHE.read_text()) if CACHE.exists() else {}
    rounds = cache.get("rounds", [])
    for _ in range(n_rounds):
        for tier in ("bench", "bench10"):
            r = _run_child(tier)
            if r:
                r["tier"] = tier
                rounds.append(r)
                print(json.dumps(r), flush=True)
    best = {}
    for r in rounds:
        k = r["tier"]
        if k not in best or r["turns_per_sec"] > best[k]["turns_per_sec"]:
            best[k] = r
    out = {"rounds": rounds}
    out.update(best)
    try:
        t1 = best["bench"]["turns_per_sec"]
        t5 = best["bench10"]["turns_per_sec"]
        # >1.0 means the 5x input ran at HIGHER per-turn throughput
        # (fixed per-job overhead amortizes); capped nowhere — report raw
        out["linearity_ratio"] = round(t5 / t1, 3)
    except (KeyError, ZeroDivisionError):
        out["linearity_ratio"] = None
    out["protocol"] = (
        "interleaved bench(2M)/bench10(10M) rounds at local[32]; "
        "steady=min of 3 noop-sink re-executions; best per tier; "
        "ratio = tput(10M)/tput(2M)"
    )
    out["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    CACHE.write_text(json.dumps(out, indent=1))
    print(
        json.dumps(
            {
                "linearity_ratio": out["linearity_ratio"],
                "bench": best.get("bench", {}).get("turns_per_sec"),
                "bench10": best.get("bench10", {}).get("turns_per_sec"),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
