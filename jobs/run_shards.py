"""spark-submit entry point for the training-shard writer.

    spark-submit --py-files fineweb_legal_spark.zip jobs/run_shards.py \
        --input /path/to/docs --output /path/to/shards \
        --budget 50000000 [--seed epoch3] [--id-col doc_id] \
        [--text-col text] [--order-by-length]

Writes the corpus as shard_id=N/ parquet directories, each holding a
token-budgeted slice of the deterministically shuffled corpus
(sources/shards.py — the assignment is a pure function of the corpus and
the seed, so a re-run or a different cluster width produces byte-wise
identical shard membership). Prints a one-line JSON report.
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
    ap.add_argument("--budget", type=int, required=True)
    ap.add_argument("--seed", default="")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument(
        "--order-by-length",
        action="store_true",
        help="curriculum order (shortest documents first) instead of the "
        "seeded md5 shuffle",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from fineweb_legal_spark.session import get_spark
    from fineweb_legal_spark.sources.shards import (
        assign_token_shards,
        write_token_shards,
    )

    spark = get_spark(master=args.master, app_name="fineweb_legal_shards")
    df = spark.read.parquet(args.input)
    order = F.length(args.text_col) if args.order_by_length else None
    a = assign_token_shards(
        df,
        args.budget,
        id_col=args.id_col,
        text_col=args.text_col,
        order_by=order,
        seed=args.seed,
    )
    report = (
        a.groupBy()
        .agg(
            F.countDistinct("shard_id").alias("shards"),
            F.count(F.lit(1)).alias("docs"),
            (F.max("start_tok")).alias("max_start_tok"),
        )
        .collect()[0]
        .asDict()
    )
    write_token_shards(
        df,
        args.output,
        args.budget,
        id_col=args.id_col,
        text_col=args.text_col,
        order_by=order,
        seed=args.seed,
    )
    print(json.dumps({k: int(v) for k, v in report.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
