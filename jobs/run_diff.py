"""spark-submit entry point for the corpus release gate.

    spark-submit --py-files fineweb_legal_spark.zip jobs/run_diff.py \
        --old /data/corpus_v1 --new /data/corpus_v2 \
        [--key doc_id --text text --group source] [--output diff.json]
    spark-submit ... jobs/run_diff.py --old table:filtered_v1 \
        --new table:filtered_v2 --warehouse /data/wh \
        --key conv_id --key turn_idx --text scrubbed_text

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
    ap.add_argument(
        "--old",
        required=True,
        help="parquet path, or table:NAME for a catalog table "
        "(with --warehouse for the persistent catalog)",
    )
    ap.add_argument("--new", required=True)
    ap.add_argument(
        "--key",
        action="append",
        default=None,
        help="document key column; repeat for a composite key "
        "(e.g. --key conv_id --key turn_idx for per-turn tables). "
        "Default: doc_id",
    )
    ap.add_argument("--text", default="text")
    ap.add_argument("--group", action="append", default=[])
    ap.add_argument("--warehouse", default=None)
    ap.add_argument("--output", default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from fineweb_legal_spark.operators.diff import corpus_diff_summary
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
        master=args.master, app_name="fineweb_legal_diff", extra_conf=extra
    )

    keys = args.key or ["doc_id"]

    def _read(src: str):
        df = (
            spark.table(src[len("table:"):])
            if src.startswith("table:")
            else spark.read.parquet(src)
        )
        if len(keys) > 1:
            from fineweb_legal_spark.operators.diff import with_composite_key

            df = with_composite_key(df, keys)
        return df

    summary = corpus_diff_summary(
        _read(args.old),
        _read(args.new),
        key_col=keys[0] if len(keys) == 1 else "__diff_key",
        text_col=args.text,
        group_cols=args.group,
    ).collect()
    obj = {
        "metric": "corpus_diff",
        "key_cols": keys,
        "group_cols": args.group,
        "rows": [r.asDict() for r in summary],
    }
    print(json.dumps(obj))
    if args.output:
        from fineweb_legal_spark.sources.sinks import write_json_sidecar

        write_json_sidecar(obj, args.output)


if __name__ == "__main__":
    main()
