"""Run ONE more N-vs-4N scaling round and fold it into the cache.

Spawns the bench.py scaling children (taskset-pinned 8 then 32 cores, same
2M-turn input, min-of-3 steady noop-sink runs), appends both results to
``data/scaling_cache.json``'s ``rounds`` list, and recomputes the headline
as best-round-per-width (the de-noising protocol for this microVM's
noisy-neighbor host — see BENCH.md). bench.py then reports the updated
cache without re-measuring.

Usage: python tools/scaling_round.py
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
CACHE = REPO / "data" / "scaling_cache.json"


def _run_child(cpus: int) -> dict | None:
    cmd = [sys.executable, str(REPO / "bench.py"), "--scaling-child", str(cpus)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}", *cmd]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=2700, cwd=str(REPO)
        )
    except subprocess.TimeoutExpired:
        # a hung child must not discard the other width's completed round
        print(f"child local[{cpus}] timed out", file=sys.stderr)
        return None
    for line in proc.stdout.splitlines():
        if line.startswith("SCALING_RESULT "):
            out = json.loads(line.split(" ", 1)[1])
            out["cpus"] = cpus
            return out
    print(f"child local[{cpus}] failed: {proc.stderr[-400:]}", file=sys.stderr)
    return None


def main() -> None:
    cache = json.loads(CACHE.read_text()) if CACHE.exists() else {}
    rounds = cache.get("rounds", [])
    for cpus in (8, 32):
        r = _run_child(cpus)
        if r:
            rounds.append(r)
    best = {}
    for r in rounds:
        k = f"local[{r['cpus']}]"
        if k not in best or r["turns_per_sec"] > best[k]["turns_per_sec"]:
            best[k] = r
    out = dict(best)
    try:
        out["efficiency"] = round(
            (best["local[32]"]["turns_per_sec"] / best["local[8]"]["turns_per_sec"])
            / 4,
            3,
        )
    except (KeyError, ZeroDivisionError):
        out["efficiency"] = None
    out["rounds"] = rounds
    out["protocol"] = (
        "interleaved 8,32 rounds; taskset-pinned; steady=min of 3 "
        "noop-sink re-executions; best round per width"
    )
    out["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    CACHE.write_text(json.dumps(out, indent=1))
    print(json.dumps({k: v for k, v in out.items() if k != "rounds"}))


if __name__ == "__main__":
    main()
