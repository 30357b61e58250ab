"""spark-submit entry point for the corpus data card.

    spark-submit --py-files fineweb_legal_spark.zip jobs/run_report.py \
        --input /path/to/verdicts_parquet [--output card.json]
    spark-submit ... jobs/run_report.py --input-table filtered \
        --warehouse /path/to/wh      # catalog-table filter run
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
        "--input-table",
        default=None,
        help="report over a catalog-table filter run "
        "(jobs/run_filter.py --output-table); reads only "
        "lineage-committed buckets via lineage_table.read_committed_table",
    )
    g.add_argument(
        "--merge",
        nargs="+",
        metavar="CARD_JSON",
        help="fold per-shard card JSON files into one corpus card "
        "(driver-only, no Spark job)",
    )
    ap.add_argument("--lineage-table", default=None)
    ap.add_argument(
        "--warehouse",
        default=None,
        help="with --input-table: the filter run's --warehouse (persistent "
        "Hive/Derby catalog holding the tables)",
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

        extra = {}
        if args.warehouse:
            wh = str(Path(args.warehouse).resolve())
            extra = {
                "spark.sql.catalogImplementation": "hive",
                "spark.sql.warehouse.dir": wh,
                "spark.hadoop.javax.jdo.option.ConnectionURL": (
                    f"jdbc:derby:;databaseName={wh}/metastore_db;create=true"
                ),
            }
        spark = get_spark(
            master=args.master, app_name="fineweb_legal_report", extra_conf=extra
        )
        if args.input_table:
            from fineweb_legal_spark.lineage_table import read_committed_table

            src = read_committed_table(
                spark,
                args.input_table,
                args.lineage_table or f"{args.input_table}_lineage",
            )
            if src is None:
                raise SystemExit(
                    f"no committed buckets in {args.input_table!r} "
                    f"(lineage table missing or empty)"
                )
        else:
            src = spark.read.parquet(args.input)
        card = corpus_report(src)
    print(json.dumps(card))
    if args.output:
        from fineweb_legal_spark.sources.sinks import write_json_sidecar

        write_json_sidecar(card, args.output)


if __name__ == "__main__":
    main()
