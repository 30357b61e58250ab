"""spark-submit entry point for the transcript quality-filter job.

    spark-submit --py-files fineweb_legal_spark.zip jobs/run_filter.py \
        --input /path/to/transcripts --output /path/to/out \
        --groups 64 [--streaming]

    # catalog-table sink (Iceberg when spark-submit carries
    # --conf spark.sql.catalog.* for one; session catalog otherwise):
    spark-submit ... jobs/run_filter.py --input /path/to/transcripts \
        --output-table filtered --warehouse /path/to/wh --groups 64

Batch mode runs the lineage-committed pipeline (resumable: rerun after a
kill and only uncommitted bucket groups are recomputed) against either a
directory sink (lineage.py) or catalog tables (lineage_table.py — the
output, lineage, and stage metrics land in tables via idempotent
partition-overwrite commits). Streaming mode tails the input directory
with an availableNow trigger.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def stream_summary(q, sink: str, table_missing: bool) -> dict:
    """Post-run summary for streaming mode.  Batches are counted from
    ``recentProgress``, not ``lastProgress``: the last progress can be
    None or only the final (often empty watermark-flush) batch, so a
    ``batches=null`` line could print after a successful multi-batch
    run.  ``table_missing`` flags that an all-empty run never created
    the table sink (foreachBatch only provisions it on the first
    non-empty frame) — say so instead of claiming silent success."""
    progresses = q.recentProgress or []
    nonempty = sum(1 for p in progresses if (p.get("numInputRows") or 0) > 0)
    summary = {
        "streaming": True,
        "sink": sink,
        "batches": len(progresses),
        "batches_nonempty": nonempty,
    }
    if nonempty == 0 and table_missing:
        summary["note"] = (
            "all batches empty: no rows committed and the sink table "
            "was never created"
        )
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument(
        "--output",
        default=None,
        help="output DIRECTORY (directory-backend lineage commits); "
        "exactly one of --output / --output-table is required",
    )
    ap.add_argument(
        "--output-table",
        default=None,
        help="output CATALOG TABLE (Iceberg when a V2 catalog is "
        "configured via spark-submit --conf spark.sql.catalog.*, stock "
        "session catalog otherwise); lineage+metrics go to "
        "--lineage-table (default <output-table>_lineage)",
    )
    ap.add_argument("--lineage-table", default=None)
    ap.add_argument(
        "--table-format",
        default=None,
        help="with --output-table: explicit table provider for CTAS "
        "(e.g. iceberg, delta, parquet); default derives it from the "
        "catalog implementation class",
    )
    ap.add_argument(
        "--warehouse",
        default=None,
        help="with --output-table: warehouse dir for the persistent "
        "(Hive/Derby) catalog so table entries — and therefore resume "
        "state — survive across job runs (a real cluster points at its "
        "Hive/Glue/Iceberg metastore instead)",
    )
    ap.add_argument("--groups", type=int, default=1)
    ap.add_argument("--streaming", action="store_true")
    ap.add_argument(
        "--checkpoint",
        default=None,
        help="streaming checkpoint dir; required with --streaming "
        "--output-table (with --output it defaults to "
        "<output>/_checkpoint)",
    )
    ap.add_argument("--master", default=None)
    ap.add_argument(
        "--verdicts-out",
        default=None,
        help="also write the FULL verdict frame (keep + reject_reason for "
        "every input turn) to this path — the input jobs/run_report.py "
        "needs for reject attribution. Opt-in: it recomputes the pipeline "
        "over the whole input once (the committed output alone only "
        "carries kept rows).",
    )
    args = ap.parse_args()
    if bool(args.output) == bool(args.output_table):
        raise SystemExit("exactly one of --output / --output-table is required")
    if args.streaming and args.output_table and not args.checkpoint:
        raise SystemExit(
            "--streaming --output-table needs --checkpoint (the table "
            "holds data, not the stream's offset/state log)"
        )

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
        master=args.master, app_name="fineweb_legal_filter", extra_conf=extra
    )

    if args.streaming:
        # FileStreamSource requires a directory to tail; a single parquet
        # FILE (fine for batch mode) fails deep inside the first
        # micro-batch with "Option 'basePath' must be a directory"
        if Path(args.input).is_file():
            raise SystemExit(
                f"--streaming input must be a directory to tail, got the "
                f"file {args.input!r}; batch mode accepts files"
            )
        if args.output_table:
            from fineweb_legal_spark.sources.catalog import TableIO
            from fineweb_legal_spark.streaming.table_sink import (
                start_filter_stream_to_table,
            )

            q = start_filter_stream_to_table(
                spark,
                args.input,
                args.output_table,
                args.checkpoint,
                io=TableIO(spark, default_format=args.table_format),
            )
        else:
            from fineweb_legal_spark.streaming.filter_stream import (
                start_filter_stream,
            )

            q = start_filter_stream(
                spark,
                args.input,
                f"{args.output}/data",
                f"{args.output}/_checkpoint",
            )
        q.awaitTermination()
        table_missing = bool(
            args.output_table
            and not spark.catalog.tableExists(args.output_table)
        )
        print(
            json.dumps(
                stream_summary(
                    q, args.output_table or args.output, table_missing
                )
            )
        )
    else:
        src = spark.read.parquet(args.input)
        if args.output_table:
            from fineweb_legal_spark.lineage_table import run_with_lineage_table
            from fineweb_legal_spark.sources.catalog import TableIO

            result = run_with_lineage_table(
                spark,
                src,
                args.output_table,
                args.lineage_table or f"{args.output_table}_lineage",
                n_groups=args.groups,
                io=TableIO(spark, default_format=args.table_format),
            )
        else:
            from fineweb_legal_spark.lineage import run_with_lineage

            result = run_with_lineage(
                spark, src, args.output, n_groups=args.groups
            )
        if args.verdicts_out:
            from fineweb_legal_spark.pipeline import run_pipeline

            run_pipeline(spark, src).write.mode("overwrite").parquet(
                args.verdicts_out
            )
            result["verdicts_out"] = args.verdicts_out
        print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
