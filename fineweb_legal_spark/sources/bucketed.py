"""Bucketed (pre-shuffled) tables for co-located joins.

At 100 TB the dominant join cost is the shuffle of the fact side. Spark's
bucketing writes a table pre-hash-partitioned AND pre-sorted on the join
key (`bucketBy(n, key).sortBy(key)`); two tables bucketed the same way
join as a zero-exchange sort-merge — the shuffle is paid ONCE at write
time and amortized over every subsequent join, the standard layout for a
repeatedly-joined dedup-registry / doc-stats / embedding sidecar.

The reference never joins (single-table pipeline, SURVEY.md §2.3), so this
has no reference analog; it is part of the engine's scale toolkit next to
broadcast (small dims) and AQE skew handling (unbucketable ad-hoc joins).

Caveats encoded here rather than left to the caller:
- bucket pruning/co-location only engages through the session catalog
  (`saveAsTable`/`spark.table`), not `read.parquet` on the files;
- both sides must have the SAME bucket count, else Spark re-shuffles the
  mismatched side (Spark does not coalesce bucket counts by default);
- one file per bucket per task: repartition by the key first so each
  bucket is a few well-sized files, not tasks x buckets fragments.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


def _clear_orphan_location(spark: SparkSession, table: str) -> None:
    """Remove a table location left behind by a crashed writer.

    `saveAsTable(mode="overwrite")` refuses to write when the managed
    location exists WITHOUT a catalog entry (LOCATION_ALREADY_EXISTS) —
    exactly the state a writer killed mid-write leaves behind, which
    would otherwise block every rerun of a staged table until someone
    hand-deletes the directory. Only the orphan case is cleaned: if the
    catalog entry exists, overwrite semantics already apply. Uses the
    Hadoop FileSystem API so the same code works on HDFS/S3 warehouses,
    not just local disk.
    """
    if "." in table:
        # qualified name: the managed location depends on that database's
        # own location — don't guess a path to delete; the writer will
        # surface LOCATION_ALREADY_EXISTS for a human to inspect
        return
    if spark.catalog.tableExists(table):
        return
    # resolve the location the way saveAsTable(unqualified) will: inside
    # the CURRENT database's own location (asked of the catalog — covers
    # CREATE DATABASE ... LOCATION and spares a hand-rolled ".db" suffix
    # guess). Resolving against the warehouse root while tableExists
    # checked the current database deleted a LIVE default-db table's
    # data when the session sat in another database.
    db = spark.catalog.currentDatabase()
    db_location = spark.catalog.getDatabase(db).locationUri
    jvm = spark._jvm  # Hadoop FS handle; same private-API caveat as session.explain_formatted
    parent = jvm.org.apache.hadoop.fs.Path(db_location)
    path = jvm.org.apache.hadoop.fs.Path(parent, table.lower())
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(path):
        fs.delete(path, True)


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 32
) -> None:
    """Persist df as a catalog table bucketed+sorted on `key`."""
    _clear_orphan_location(df.sparkSession, table)
    (
        df.repartition(n_buckets, key)
        .write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("compression", "snappy")
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two identically-bucketed catalog tables on their bucket key.

    With matching bucket specs the physical plan is a sort-merge join with
    NO Exchange on either side (verified by tests/test_bucketing.py); the
    pre-sorted buckets also elide the per-task Sort.
    """
    return spark.table(left_table).join(spark.table(right_table), key)


def write_scored_bucketed(
    df: DataFrame,
    table: str,
    key: str = "norm_key",
    order: Sequence[str] = ("conv_id", "turn_idx"),
    n_buckets: int = 32,
) -> None:
    """Stage a scored table for repeated zero-exchange dedup passes.

    Null dedup keys (rejects never enter the registry) are coalesced to a
    synthetic per-row singleton key — "\\x00" + the order coordinates, the
    same trick `pipeline.py:396-399` uses in-flight — BEFORE bucketing, so
    the stored bucket key is never null. That keeps every later window
    over `key` a plain partitionBy(bucket column): no null-partition
    skew, no expression over the bucket column that would force an
    Exchange back in. Rejects are recognizable downstream by the "\\x00"
    prefix.
    """
    # "#"-separated like pipeline.py's in-flight key: concatenating bare
    # coordinates would collide ("c1",23) with ("c12",3) and silently drop
    # a reject row in the dedup window
    # "\x01" stands in for NULL coordinates: concat null-propagates, and a
    # NULL synthetic key would funnel every such reject into one window
    # partition and silently drop all but one
    parts: list = [F.lit("\x00")]
    for i, c in enumerate(order):
        if i:
            parts.append(F.lit("#"))
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("\x01")))
    filled = df.withColumn(key, F.coalesce(F.col(key), F.concat(*parts)))
    write_bucketed(filled, table, key, n_buckets)


def bucketed_dedup(
    spark: SparkSession,
    table: str,
    key: str = "norm_key",
    order: Sequence[str] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Zero-exchange staged dedup over a table bucketed on the dedup key.

    The in-pipeline dedup (`pipeline.py:run_pipeline`) pays one slim
    exchange per run to cluster rows by `norm_key`. The staged layout
    pays that shuffle ONCE: stage 1 writes the scored table with
    `write_scored_bucketed`, and every later dedup / registry /
    duplicate-audit pass over it plans with ZERO Exchange — the bucketed
    scan already satisfies the window's hash distribution, so only a
    per-bucket local Sort remains, and Spark's WindowGroupLimit pushdown
    drops losers before the full window materializes (both asserted by
    tests/test_bucketing.py). At 100 TB this is the layout for a
    verdicts table that is re-deduped incrementally or audited
    repeatedly: the shuffle is amortized, and a rerun costs one scan.

    `order` breaks ties deterministically, matching the pipeline's
    min-(conv_id, turn_idx) winner rule. Synthetic singleton keys from
    `write_scored_bucketed` are unique per row, so rejects survive with
    rn = 1 and no partition carries more than one of them.
    """
    t = spark.table(table)
    w = Window.partitionBy(key).orderBy(*[F.col(c).asc() for c in order])
    return (
        t.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def bucketed_incremental_dedup(
    spark: SparkSession,
    base_table: str | Sequence[str],
    slice_table: str,
    key: str = "norm_key",
    order: Sequence[str] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Dedup a newly arrived slice against a staged base, zero Exchange.

    The incremental analog of `bucketed_dedup`: the base is the
    already-committed staged table — or a FAMILY of identically-bucketed
    tables (the base plus previously committed survivor slices, the
    shape `jobs/run_staged_dedup.py` maintains so increments never
    rewrite the base); the new slice is written with
    `write_scored_bucketed` at the SAME bucket count (its one small
    shuffle). The pass is then (a) intra-slice winners via the bucketed
    window and (b) one left-anti sort-merge join per base-family table —
    all served by the bucket layout, so the plan has no Exchange and
    the base is never re-shuffled no matter how large it has grown
    (tests/test_bucketing.py asserts the plan). This is the lineage
    registry contract (`lineage.py` anti-join) re-expressed over the
    staged layout: per-increment cost is O(slice) + one scan of each
    family member's key column. Bound the family size with periodic
    offline compaction (the streaming registry's slice-count policy).

    The base's synthetic singleton keys ("\\x00"-prefixed rejects from
    `write_scored_bucketed`) embed their own order coordinates, so they
    can never collide with a slice key — committed rejects don't block
    future rows.

    Measured (BENCH.md, 1.82M base + 182k slice, local[32]): steady
    1.73 s vs 0.36 s for a classic shuffle-window re-dedup of the union
    — on ONE box the ~35 MB slim exchange is free and the classic pass
    wins. Use this operator when the base is large enough that
    re-shuffling it every increment is the dominant cost (the 100-TB
    regime it exists for), not as a local micro-optimization.
    """
    tables = [base_table] if isinstance(base_table, str) else list(base_table)
    fresh = bucketed_dedup(spark, slice_table, key, order)
    for t in tables:
        fresh = fresh.join(spark.table(t).select(key), key, "left_anti")
    return fresh
