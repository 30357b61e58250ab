"""spark-submit entry point for the staged-dedup lifecycle.

    spark-submit --py-files fineweb_legal_spark.zip jobs/run_staged_dedup.py \
        --table scored_base --mode init   --input /path/to/scored.parquet
    spark-submit ... jobs/run_staged_dedup.py \
        --table scored_base --mode append --input /path/to/new_slice.parquet \
        --slice-table scored_slice --output /path/to/survivors

``init`` stages the scored frame as a norm_key-bucketed catalog table —
the one shuffle the layout ever pays. ``append`` stages a new slice at
the same bucket count, dedups it against the base with zero Exchange
(intra-slice window + left-anti sort-merge join, both served by the
bucket layout), writes the survivors, and folds them into the base table
so the next increment sees them. Input frames must carry
(conv_id, turn_idx, norm_key); null norm_keys become synthetic
singleton reject keys at write (sources/bucketed.py).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

# direct `python jobs/run_staged_dedup.py` runs (no --py-files zip):
# put the repo root on sys.path, same idiom as tools/*
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="staged base table name")
    ap.add_argument("--mode", choices=("init", "append"), required=True)
    ap.add_argument("--input", required=True, help="scored parquet to stage")
    ap.add_argument("--slice-table", default=None,
                    help="append mode: catalog name for the staged slice")
    ap.add_argument("--output", default=None,
                    help="append mode: where to write the slice's survivors")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--master", default=None)
    ap.add_argument("--warehouse", default=None,
                    help="warehouse dir; the staged table and its Derby "
                         "metastore live here so catalog entries survive "
                         "across job runs (a real cluster points at its "
                         "Hive/Glue metastore instead)")
    args = ap.parse_args()

    from fineweb_legal_spark.session import get_spark
    from fineweb_legal_spark.sources.bucketed import (
        bucketed_incremental_dedup,
        write_scored_bucketed,
    )

    # the staged lifecycle spans spark-submit RUNS: the bucketed base's
    # catalog entry must outlive this process, so use the persistent
    # (Hive/Derby) catalog, not the session-scoped in-memory one
    extra = {"spark.sql.catalogImplementation": "hive"}
    if args.warehouse:
        wh = str(Path(args.warehouse).resolve())
        extra["spark.sql.warehouse.dir"] = wh
        extra["spark.hadoop.javax.jdo.option.ConnectionURL"] = (
            f"jdbc:derby:;databaseName={wh}/metastore_db;create=true"
        )
    spark = get_spark(
        master=args.master,
        app_name="fineweb_legal_staged_dedup",
        extra_conf=extra,
    )
    src = spark.read.parquet(args.input)

    if args.mode == "init":
        write_scored_bucketed(src, args.table, n_buckets=args.buckets)
        print(json.dumps({"mode": "init", "table": args.table,
                          "rows": spark.table(args.table).count()}))
    else:
        slice_table = args.slice_table or f"{args.table}_slice"
        write_scored_bucketed(src, slice_table, n_buckets=args.buckets)
        survivors = bucketed_incremental_dedup(spark, args.table, slice_table)
        if args.output:
            survivors.write.mode("overwrite").parquet(args.output)
            survivors = spark.read.parquet(args.output)
        # fold survivors into the base so the next increment sees them;
        # the union is written back bucketed (one bounded shuffle over
        # base+survivors keys — at 10^12 keys prefer partitioned bases,
        # see streaming registry compaction for the slice-count analog)
        merged = spark.table(args.table).unionByName(survivors)
        write_scored_bucketed(
            merged.localCheckpoint(), args.table, n_buckets=args.buckets
        )
        print(json.dumps({"mode": "append", "table": args.table,
                          "survivors": survivors.count(),
                          "base_rows": spark.table(args.table).count()}))
    spark.stop()


if __name__ == "__main__":
    main()
