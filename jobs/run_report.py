"""spark-submit entry point for the corpus data card.

    spark-submit --py-files fineweb_legal_spark.zip jobs/run_report.py \
        --input /path/to/verdicts_parquet [--output card.json]
    python jobs/run_report.py --merge shard1/card.json shard2/card.json ...

Reads a WRITTEN verdict table (the filter job's output — at scale you
report over the committed parquet, never a recomputed pipeline), prints
the data card as one JSON line, and optionally writes it as an atomic
JSON sidecar next to the dataset. ``--merge`` folds previously written
per-shard cards into one corpus card without any Spark job at all (pure
counter merge, report.merge_cards).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--input", default=None)
    g.add_argument(
        "--merge",
        nargs="+",
        metavar="CARD_JSON",
        help="fold per-shard card JSON files into one corpus card "
        "(driver-only, no Spark job)",
    )
    ap.add_argument("--output", default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    if args.merge:
        from fineweb_legal_spark.report import merge_cards

        card = merge_cards(
            [json.loads(Path(p).read_text()) for p in args.merge]
        )
    else:
        from fineweb_legal_spark.report import corpus_report
        from fineweb_legal_spark.session import get_spark

        spark = get_spark(master=args.master, app_name="fineweb_legal_report")
        card = corpus_report(spark.read.parquet(args.input))
    print(json.dumps(card))
    if args.output:
        from fineweb_legal_spark.sources.sinks import write_json_sidecar

        write_json_sidecar(card, args.output)


if __name__ == "__main__":
    main()
