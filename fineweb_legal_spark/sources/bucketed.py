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

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 32
) -> None:
    """Persist df as a catalog table bucketed+sorted on `key`."""
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
