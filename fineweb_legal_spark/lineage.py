"""Checkpointed, idempotent per-partition commits + lineage/metrics tables.

Reproduces the reference's resume semantics (SURVEY.md §2.9 T3/T4/T7:
state JSON + immutable batch files + skip-existing-outputs) with the
Spark-native design: the unit of commit is a conv_id hash bucket; a tiny
lineage record published ATOMICALLY (tmp file + os.replace, the same
primitive as reference storage.py:220-235) marks a bucket group visible.
Readers and reruns trust only the lineage table:

- a killed run leaves data files without lineage rows -> the rerun
  recomputes exactly the uncommitted buckets (dynamic partition overwrite
  discards the partial files), never the committed ones;
- rerunning a completed job is a no-op;
- double commits are impossible (lineage file name == group id).

On a real cluster the input would be an Iceberg table bucket-partitioned by
conv_id so the per-group filter prunes at the manifest level; on plain
parquet the group filter is evaluated in the scan stage (still one pass per
group). With the default single group there is exactly ONE full pass.

Layout under ``out_dir``:
    data/bucket=NN/part-*.parquet     (snappy, sorted by conv_id, turn_idx)
    _lineage/group-<gid>.parquet      (bucket, status, kept, dropped,
                                       scrubbed, committed_at)
"""

from __future__ import annotations

import os
from datetime import datetime, timezone
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark import StorageLevel
from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from . import spec
from .pipeline import run_pipeline

BUCKET_COL = "bucket"


def bucket_of(col):
    return F.pmod(F.xxhash64(col), F.lit(spec.LINEAGE_BUCKETS)).cast("int")


def committed_buckets(out_dir: str | Path) -> set[int]:
    ldir = Path(out_dir) / "_lineage"
    if not ldir.exists():
        return set()
    done: set[int] = set()
    for f in sorted(ldir.glob("group-*.parquet")):
        t = pq.read_table(f, columns=["bucket"])
        done.update(int(b) for b in t["bucket"].to_pylist())
    return done


def read_lineage(spark: SparkSession, out_dir: str | Path) -> DataFrame:
    # mergeSchema: lineage schema grew committed_at in round 2; a resume
    # over an output dir mixing old 5-col and new 6-col group-*.parquet
    # must surface the column (as null for old files) instead of silently
    # dropping it depending on which footer wins schema inference.
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(str(Path(out_dir) / "_lineage"))
    )


def read_committed_output(spark: SparkSession, out_dir: str | Path) -> DataFrame:
    """Reader side of the protocol: only lineage-committed buckets are
    visible (the T4 'no partial visibility' guarantee).

    A committed bucket may have NO data directory: dynamic partition
    overwrite writes nothing for an all-rejected bucket, yet the lineage
    record still marks it committed. Filter the path list to directories
    that exist so the scan never hits PATH_NOT_FOUND; all-empty -> None.
    """
    done = committed_buckets(out_dir)
    data = Path(out_dir) / "data"
    paths = [
        str(data / f"bucket={b}")
        for b in sorted(done)
        if (data / f"bucket={b}").is_dir()
    ]
    return (
        spark.read.option("basePath", str(data)).parquet(*paths) if paths else None
    )


def group_metric_exprs(group: list[int]) -> list:
    """Per-bucket kept/dropped/scrubbed counters + the engine-clock commit
    timestamp, as observe() expressions over the pre-keep-filter frame."""
    exprs = []
    for b in group:
        is_b = F.col(BUCKET_COL) == b
        exprs += [
            F.sum((is_b & F.col("keep")).cast("long")).alias(f"kept_{b}"),
            F.sum((is_b & ~F.col("keep")).cast("long")).alias(f"dropped_{b}"),
            F.sum(
                (
                    is_b
                    & F.col("keep")
                    & (F.col("scrubbed_text") != F.col("text"))
                ).cast("long")
            ).alias(f"scrubbed_{b}"),
        ]
    # committed_at via the engine clock (reference storage.py:278 analog)
    exprs.append(F.max(F.current_timestamp()).alias("committed_at"))
    return exprs


def group_commit_stats(kept: DataFrame, group: list[int], obs: Observation) -> dict:
    """The observed metrics for a committed group, with the explicit-agg
    fallback for all-rejected groups (whose zero-row write lets AQE
    eliminate the CollectMetrics subtree so the observation never fires)."""
    try:
        return obs.get
    except Exception:  # noqa: BLE001
        stats_rows = (
            kept.groupBy(BUCKET_COL)
            .agg(
                F.sum(F.col("keep").cast("long")).alias("kept"),
                F.sum((~F.col("keep")).cast("long")).alias("dropped"),
                F.sum(
                    (
                        F.col("keep")
                        & (F.col("scrubbed_text") != F.col("text"))
                    ).cast("long")
                ).alias("scrubbed"),
            )
            .collect()
        )
        got: dict = {}
        for r in stats_rows:
            b = int(r[BUCKET_COL])
            for k in ("kept", "dropped", "scrubbed"):
                got[f"{k}_{b}"] = int(r[k])
        return got


def run_with_lineage(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str | Path,
    n_groups: int = 1,
    max_groups: int | None = None,
) -> dict:
    """Filter + scrub + write, committing one bucket group at a time.

    ``max_groups`` exists for kill-simulation in tests (process only the
    first K groups, as if the job died there).
    """
    out = Path(out_dir)
    (out / "data").mkdir(parents=True, exist_ok=True)
    (out / "_lineage").mkdir(parents=True, exist_ok=True)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    done = committed_buckets(out)
    all_buckets = list(range(spec.LINEAGE_BUCKETS))
    pending = [b for b in all_buckets if b not in done]
    groups: list[list[int]] = [
        pending[i::n_groups] for i in range(n_groups)
    ]
    groups = [g for g in groups if g]

    if not groups:
        return {
            "committed_before": len(done),
            "committed_now": len(done),
            "groups_processed": 0,
            "buckets_processed": 0,
        }

    # ONE pipeline pass over all pending buckets, persisted, so per-group
    # commits slice cached results instead of recomputing. Dedup is
    # therefore global over (pending ∪ committed-registry): starting from an
    # empty registry this reproduces the uninterrupted global dedup exactly,
    # and any kill/resume sequence converges to the same kept set.
    # (Committed-hash registry = reference J1 / seen_hashes.json analog.)
    pending_all = [b for g in groups for b in g]
    if max_groups is not None:
        # kill simulation: the verdict pass over ALL pending always runs
        # (a real kill interrupts the commit loop, after compute) — only
        # the commits are cut short
        groups = groups[:max_groups]
    pending_src = transcripts.filter(bucket_of(F.col("conv_id")).isin(pending_all))
    committed_df = read_committed_output(spark, out)
    registry = committed_df.select("norm_key") if committed_df is not None else None
    # slim_dedup=False: this path persists kept_all (full payload) right
    # below anyway, so a second cached intermediate inside the dedup would
    # only double the storage footprint of the run.
    verdicts = run_pipeline(
        spark,
        pending_src,
        exclude_keys=registry,
        include_norm_key=True,
        slim_dedup=False,
    )
    kept_all = (
        pending_src.join(
            verdicts.select(
                "conv_id", "turn_idx", "keep", "scrubbed_text", "lang",
                "ppl_bucket", "norm_key",
            ),
            ["conv_id", "turn_idx"],
        ).withColumn(BUCKET_COL, bucket_of(F.col("conv_id")))
    ).persist(StorageLevel.DISK_ONLY)
    # DISK_ONLY: kept_all carries the full text payload; at cluster scale a
    # MEMORY_AND_DISK cache of the whole corpus evicts everything else.

    processed = 0
    for group in groups:
        gid = "-".join(str(b) for b in group)
        kept = kept_all.filter(F.col(BUCKET_COL).isin(group))
        # Single-pass metrics (reference T8/A2 via df.observe, SURVEY §2.9):
        # the CollectMetrics node sits UNDER the keep-filter, so the write
        # action itself produces the per-bucket kept/dropped/scrubbed
        # counters — no second aggregation pass over the group.
        obs = Observation(f"lineage-{gid}")
        # stage the data: dynamic overwrite replaces only the touched buckets
        (
            kept.observe(obs, *group_metric_exprs(group))
            .filter("keep")
            .drop("keep")
            .repartition(BUCKET_COL)
            .sortWithinPartitions("conv_id", "turn_idx")
            .write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .option("compression", "snappy")
            .parquet(str(out / "data"))
        )
        got = group_commit_stats(kept, group, obs)

        def _stat(b: int, k: str) -> int:
            v = got.get(f"{k}_{b}")
            return int(v) if v is not None else 0

        committed_at = got.get("committed_at") or datetime.now(timezone.utc)
        table = pa.table(
            {
                "bucket": pa.array(group, pa.int32()),
                "status": pa.array(["committed"] * len(group), pa.string()),
                "kept": pa.array([_stat(b, "kept") for b in group], pa.int64()),
                "dropped": pa.array([_stat(b, "dropped") for b in group], pa.int64()),
                "scrubbed": pa.array([_stat(b, "scrubbed") for b in group], pa.int64()),
                "committed_at": pa.array(
                    [committed_at] * len(group), pa.timestamp("us", tz="UTC")
                ),
            }
        )
        # atomic publish: the lineage record IS the commit point
        final = out / "_lineage" / f"group-{gid}.parquet"
        tmp = out / "_lineage" / f".group-{gid}.tmp"
        pq.write_table(table, tmp, compression="snappy")
        os.replace(tmp, final)
        processed += len(group)

    kept_all.unpersist()
    return {
        "committed_before": len(done),
        "committed_now": len(committed_buckets(out)),
        "groups_processed": len(groups),
        "buckets_processed": processed,
    }
