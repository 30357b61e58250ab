"""Kill-and-resume idempotence (FIXTURES.md §4 invariant 5, reference
T3/T4/T7 semantics)."""

from __future__ import annotations

import shutil
from pathlib import Path

from fineweb_legal_spark import spec
from fineweb_legal_spark.datasets import DATA_DIR
from fineweb_legal_spark.lineage import (
    committed_buckets,
    read_committed_output,
    read_lineage,
    run_with_lineage,
)

OUT = DATA_DIR / "tmp" / "lineage_test"


def _clean():
    shutil.rmtree(OUT, ignore_errors=True)


def test_kill_resume_idempotent(spark, t1_transcripts, t1_golden):
    _clean()
    # simulated kill: only 2 of 4 commit groups run
    r1 = run_with_lineage(spark, t1_transcripts, OUT, n_groups=4, max_groups=2)
    assert r1["groups_processed"] == 2
    n_committed = len(committed_buckets(OUT))
    assert 0 < n_committed < spec.LINEAGE_BUCKETS
    partial_rows = read_committed_output(spark, OUT).count()

    # resume: completes only the remaining buckets
    r2 = run_with_lineage(spark, t1_transcripts, OUT, n_groups=4)
    assert r2["committed_before"] == n_committed
    assert len(committed_buckets(OUT)) == spec.LINEAGE_BUCKETS

    out = read_committed_output(spark, OUT).toPandas()
    assert len(out) > partial_rows
    # committed output == golden kept set, exactly, no duplicates
    kept_gold = t1_golden[t1_golden.keep]
    assert len(out) == len(kept_gold)
    assert not out.duplicated(subset=["conv_id", "turn_idx"]).any()
    merged = kept_gold.merge(
        out, on=["conv_id", "turn_idx"], suffixes=("_g", "_s"), how="inner"
    )
    assert len(merged) == len(kept_gold)
    assert (merged.scrubbed_text_g == merged.scrubbed_text_s).all()

    # lineage metrics add up to the full table
    lin = read_lineage(spark, OUT).toPandas()
    assert int(lin.kept.sum()) == len(kept_gold)
    assert int((lin.kept + lin.dropped).sum()) == len(t1_golden)
    assert (lin.status == "committed").all()

    # rerun of a completed job is a no-op
    r3 = run_with_lineage(spark, t1_transcripts, OUT, n_groups=4)
    assert r3["groups_processed"] == 0
    _clean()


def test_all_rejected_bucket_commits_and_resumes(spark):
    """A committed bucket with ZERO kept rows writes no data directory
    (dynamic partition overwrite); the reader and the resume path must
    tolerate that instead of failing with PATH_NOT_FOUND."""
    from datetime import datetime

    from fineweb_legal_spark.streaming.filter_stream import TRANSCRIPT_SCHEMA

    _clean()
    # conversations whose every turn fails the length rule (too short) ->
    # whole buckets end up all-rejected
    ts = datetime(2025, 1, 1)
    rows = [
        (f"conv{i}", t, "user", "tiny", None, ts)
        for i in range(64)
        for t in range(3)
    ]
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)

    r1 = run_with_lineage(spark, df, OUT, n_groups=1)
    assert r1["buckets_processed"] == spec.LINEAGE_BUCKETS
    lin = read_lineage(spark, OUT).toPandas()
    assert int(lin.kept.sum()) == 0
    assert int(lin.dropped.sum()) == len(rows)
    assert "committed_at" in lin.columns and lin.committed_at.notna().all()

    # reader: all buckets committed, none have data -> None, not an error
    assert read_committed_output(spark, OUT) is None

    # resume on the fully-committed (but dataless) output is a no-op
    r2 = run_with_lineage(spark, df, OUT, n_groups=1)
    assert r2["groups_processed"] == 0
    _clean()
