"""Sinks (SURVEY.md §2.1 parity): snappy Parquet batches, CSV audit files,
atomic JSON sidecars, merge/compaction.

Reference analogs: storage.py:206-235 (atomic parquet), storage.py:303-339
(merge-all), test_inference_mac.py:202-212 (CSV audit),
stream_filter_stage1.py:258-271 (state JSON, tmp+rename).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def write_parquet_batches(
    df: DataFrame, path: str | Path, max_records_per_file: int = 100_000
) -> None:
    """Immutable snappy batch files (reference micro-batch sink S4/T2):
    file granularity via maxRecordsPerFile instead of a hand-rolled buffer;
    the committer's temp+rename replaces the reference's atomic-write
    routine."""
    (
        df.write.mode("overwrite")
        .option("compression", "snappy")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(str(path))
    )


def write_csv_audit(df: DataFrame, path: str | Path) -> None:
    """CSV audit sink (S10)."""
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(str(path))


def write_json_sidecar(payload: dict, path: str | Path) -> None:
    """Atomic small-JSON sidecar (S11) — driver-side, non-critical path;
    tmp + os.replace like the reference's save_state."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp")
    tmp.write_text(json.dumps(payload, sort_keys=True, indent=2))
    os.replace(tmp, path)


def merge_parquet(
    spark: SparkSession, src_dir: str | Path, out_path: str | Path, n_files: int = 1
) -> int:
    """Merge-all compaction (S9): read the batch directory as one table and
    rewrite with bounded file count. Returns row count."""
    df = spark.read.parquet(str(src_dir))
    df.coalesce(n_files).write.mode("overwrite").option(
        "compression", "snappy"
    ).parquet(str(out_path))
    return spark.read.parquet(str(out_path)).count()
