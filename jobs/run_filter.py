"""spark-submit entry point for the transcript quality-filter job.

    spark-submit --py-files fineweb_legal_spark.zip jobs/run_filter.py \
        --input /path/to/transcripts --output /path/to/out \
        --groups 64 [--streaming]

Batch mode runs the lineage-committed pipeline (resumable: rerun after a
kill and only uncommitted bucket groups are recomputed). Streaming mode
tails the input directory with an availableNow trigger.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--groups", type=int, default=1)
    ap.add_argument("--streaming", action="store_true")
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

    from fineweb_legal_spark.session import get_spark

    spark = get_spark(master=args.master, app_name="fineweb_legal_filter")

    if args.streaming:
        # FileStreamSource requires a directory to tail; a single parquet
        # FILE (fine for batch mode) fails deep inside the first
        # micro-batch with "Option 'basePath' must be a directory"
        if Path(args.input).is_file():
            raise SystemExit(
                f"--streaming input must be a directory to tail, got the "
                f"file {args.input!r}; batch mode accepts files"
            )
        from fineweb_legal_spark.streaming.filter_stream import start_filter_stream

        q = start_filter_stream(
            spark,
            args.input,
            f"{args.output}/data",
            f"{args.output}/_checkpoint",
        )
        q.awaitTermination()
    else:
        from fineweb_legal_spark.lineage import run_with_lineage

        src = spark.read.parquet(args.input)
        result = run_with_lineage(spark, src, args.output, n_groups=args.groups)
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
