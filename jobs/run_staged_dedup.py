"""spark-submit entry point for the staged-dedup lifecycle.

    spark-submit --py-files fineweb_legal_spark.zip jobs/run_staged_dedup.py \
        --table scored_base --mode init    --input /path/to/scored.parquet
    spark-submit ... --table scored_base --mode append \
        --input /path/to/new_slice.parquet --output /path/to/survivors
    spark-submit ... --table scored_base --mode compact

``init`` stages the scored frame as a norm_key-bucketed catalog table —
the one big shuffle the layout ever pays. ``append`` stages the new
slice at the base's bucket count (introspected from the catalog, so a
mismatched --buckets cannot silently defeat the co-location), dedups it
against the base FAMILY — the base plus every previously committed
survivor slice — with zero Exchange (intra-slice window + one left-anti
sort-merge join per family member), and publishes the survivors as a
NEW immutable slice table ``<table>__s<k>``. The base is NEVER
rewritten per increment: per-append cost is O(slice) plus one pruned
key-column scan per family member, and a crashed append leaves at most
an orphan location that the next run's writer clears.

``compact`` (offline, not concurrent with appends — the streaming
registry's compaction discipline) folds base + slices into a fresh
generation table and swaps it in with catalog renames ordered so every
crash window leaves a superset recoverable: gen is written first, the
old base is renamed aside, gen is renamed live, and only then are the
old base and folded slices dropped. ``_recover`` repairs any
mid-compact crash at the next start (newest gen or the set-aside old
base becomes the live table; leftover folded slices re-fold on the
next compact and are anti-join-harmless meanwhile).

Input frames must carry (conv_id, turn_idx, norm_key); null norm_keys
become synthetic singleton reject keys at write (sources/bucketed.py).
The lifecycle spans spark-submit RUNS, so the job uses the persistent
(Hive/Derby) catalog — point --warehouse at the dataset's home (a real
cluster uses its Hive/Glue metastore instead).
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

# direct `python jobs/run_staged_dedup.py` runs (no --py-files zip):
# put the repo root on sys.path, same idiom as tools/*
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _family(spark, table: str, kind: str) -> list[tuple[int, str]]:
    """Committed family members ``<table>__<kind><k>``, sorted by k."""
    rx = re.compile(re.escape(table) + "__" + kind + r"(\d+)$")
    out = []
    for r in spark.sql(f"SHOW TABLES LIKE '{table}__{kind}*'").collect():
        m = rx.match(r.tableName)
        if m:
            out.append((int(m.group(1)), r.tableName))
    return sorted(out)


def _table_buckets(spark, table: str) -> int:
    for r in spark.sql(f"DESCRIBE EXTENDED {table}").collect():
        if r.col_name == "Num Buckets":
            return int(r.data_type)
    raise ValueError(f"{table} is not a bucketed table")


def _recover(spark, table: str) -> None:
    """Repair a mid-compact crash: if the live table is missing, promote
    the newest complete generation (superset) or the set-aside old base."""
    if spark.catalog.tableExists(table):
        return
    gens = _family(spark, table, "gen")
    olds = _family(spark, table, "old")
    if gens:
        spark.sql(f"ALTER TABLE {gens[-1][1]} RENAME TO {table}")
        for _, g in gens[:-1]:
            spark.sql(f"DROP TABLE IF EXISTS {g}")
        for _, o in olds:
            spark.sql(f"DROP TABLE IF EXISTS {o}")
    elif olds:
        spark.sql(f"ALTER TABLE {olds[-1][1]} RENAME TO {table}")


def run(spark, args) -> dict:
    from fineweb_legal_spark.sources.bucketed import (
        bucketed_incremental_dedup,
        write_scored_bucketed,
    )

    table = args.table
    if args.mode == "init":
        src = spark.read.parquet(args.input)
        write_scored_bucketed(src, table, n_buckets=args.buckets)
        return {"mode": "init", "table": table,
                "rows": spark.table(table).count()}

    _recover(spark, table)
    family = [table] + [t for _, t in _family(spark, table, "s")]

    if args.mode == "append":
        n_buckets = _table_buckets(spark, table)
        if args.buckets and args.buckets != n_buckets:
            print(f"note: --buckets {args.buckets} ignored; base is "
                  f"bucketed {n_buckets}", file=sys.stderr)
        src = spark.read.parquet(args.input)
        staging = f"{table}__staging"
        write_scored_bucketed(src, staging, n_buckets=n_buckets)
        survivors = bucketed_incremental_dedup(spark, family, staging)
        sid = (_family(spark, table, "s") or [(0, "")])[-1][0] + 1
        slice_name = f"{table}__s{sid}"
        # publish under a FRESH name: the slice becomes visible only when
        # its catalog entry lands; a crash mid-write leaves an orphan
        # location the next writer clears (write_bucketed recovery)
        write_scored_bucketed(survivors, slice_name, n_buckets=n_buckets)
        spark.sql(f"DROP TABLE IF EXISTS {staging}")
        committed = spark.table(slice_name)
        if args.output:
            committed.write.mode("overwrite").parquet(args.output)
        return {"mode": "append", "table": table, "slice": slice_name,
                "survivors": committed.count(),
                "family_rows": sum(
                    spark.table(t).count() for t in family) + committed.count()}

    # compact: fold base + slices into a fresh generation, swap via
    # renames (never drop the only copy before its superset is live)
    slices = _family(spark, table, "s")
    if not slices:
        return {"mode": "compact", "table": table, "folded": 0}
    n_buckets = _table_buckets(spark, table)
    for _, g in _family(spark, table, "gen"):  # stale: base is live
        spark.sql(f"DROP TABLE IF EXISTS {g}")
    gen = f"{table}__gen{slices[-1][0]}"
    merged = spark.table(table)
    for _, s in slices:
        merged = merged.unionByName(spark.table(s))
    write_scored_bucketed(merged, gen, n_buckets=n_buckets)
    old = f"{table}__old{slices[-1][0]}"
    spark.sql(f"DROP TABLE IF EXISTS {old}")
    spark.sql(f"ALTER TABLE {table} RENAME TO {old}")
    spark.sql(f"ALTER TABLE {gen} RENAME TO {table}")
    spark.sql(f"DROP TABLE IF EXISTS {old}")
    for _, s in slices:
        spark.sql(f"DROP TABLE IF EXISTS {s}")
    return {"mode": "compact", "table": table, "folded": len(slices),
            "rows": spark.table(table).count()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="staged base table name")
    ap.add_argument("--mode", choices=("init", "append", "compact"),
                    required=True)
    ap.add_argument("--input", default=None, help="scored parquet to stage")
    ap.add_argument("--output", default=None,
                    help="append mode: also copy the survivors here")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--master", default=None)
    ap.add_argument("--warehouse", default=None,
                    help="warehouse dir; the staged tables and their Derby "
                         "metastore live here so catalog entries survive "
                         "across job runs (a real cluster points at its "
                         "Hive/Glue metastore instead)")
    args = ap.parse_args()
    if args.mode in ("init", "append") and not args.input:
        ap.error(f"--input is required for mode {args.mode}")

    from fineweb_legal_spark.session import get_spark

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
    print(json.dumps(run(spark, args)))
    spark.stop()


if __name__ == "__main__":
    main()
