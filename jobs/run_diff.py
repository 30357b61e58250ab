"""spark-submit entry point for the corpus release gate.

    spark-submit --py-files fineweb_legal_spark.zip jobs/run_diff.py \
        --old /data/corpus_v1 --new /data/corpus_v2 \
        [--key doc_id --text text --group source] [--output diff.json]

Diffs two corpus versions (operators/diff.py) and prints one JSON line:
per-(group, status) document counts plus old/new totals — the numbers a
release review reads before shipping a rebuilt corpus. Optionally writes
the same object as an atomic JSON sidecar.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", required=True)
    ap.add_argument("--new", required=True)
    ap.add_argument("--key", default="doc_id")
    ap.add_argument("--text", default="text")
    ap.add_argument("--group", action="append", default=[])
    ap.add_argument("--output", default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from fineweb_legal_spark.operators.diff import corpus_diff_summary
    from fineweb_legal_spark.session import get_spark

    spark = get_spark(master=args.master, app_name="fineweb_legal_diff")
    summary = corpus_diff_summary(
        spark.read.parquet(args.old),
        spark.read.parquet(args.new),
        key_col=args.key,
        text_col=args.text,
        group_cols=args.group,
    ).collect()
    obj = {
        "metric": "corpus_diff",
        "group_cols": args.group,
        "rows": [r.asDict() for r in summary],
    }
    print(json.dumps(obj))
    if args.output:
        from fineweb_legal_spark.sources.sinks import write_json_sidecar

        write_json_sidecar(obj, args.output)


if __name__ == "__main__":
    main()
