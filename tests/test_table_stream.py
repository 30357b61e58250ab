"""Streaming catalog-table sink (streaming/table_sink.py): exactly-once
via batch-id partition overwrite, equivalence with the parquet sink,
and resume-without-reprocessing on restart."""

from __future__ import annotations

import shutil

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from fineweb_legal_spark.datasets import DATA_DIR, ensure_transcripts
from fineweb_legal_spark.sources.catalog import TableIO
from fineweb_legal_spark.streaming.table_sink import (
    start_filter_stream_to_table,
    table_batch_writer,
)

BASE = DATA_DIR / "tmp" / "table_stream_test"
TBL = "stream_filtered"


@pytest.fixture()
def _env(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    spark.sql(f"DROP TABLE IF EXISTS {TBL}")
    src = BASE / "src"
    src.mkdir(parents=True)
    t = pq.read_table(ensure_transcripts("t1"))
    # 10 files > the stream's maxFilesPerTrigger=8 -> at least two
    # NON-empty micro-batches, so the batch-partitioned commits must
    # coexist (a whole-table STATIC overwrite per batch would lose the
    # earlier batch — the cross-session conf regression this pins)
    step = (len(t) + 9) // 10
    for i in range(10):
        pq.write_table(t.slice(i * step, step), src / f"part-{i}.parquet")
    yield str(src)
    spark.sql(f"DROP TABLE IF EXISTS {TBL}")
    shutil.rmtree(BASE, ignore_errors=True)


def test_stream_to_table_exactly_once_and_resume(spark, _env, t1_golden):
    src = _env
    cp = str(BASE / "cp")
    q = start_filter_stream_to_table(spark, src, TBL, cp)
    q.awaitTermination(300)
    got = spark.table(TBL).toPandas()
    assert len(got) > 0
    assert not got.duplicated(subset=["conv_id", "turn_idx"]).any()
    assert got["scrubbed_text"].notna().all()
    assert got["batch_id"].notna().all()
    assert got["batch_id"].nunique() >= 2  # multi-batch run, all retained
    # the streaming dedup contract is bounded-window and first-arrival
    # (start_filter_stream docstring): across micro-batches the kept
    # representative of a duplicate key may be a DIFFERENT copy than the
    # batch pipeline's deterministic min-(conv_id,turn_idx) winner, and
    # a key whose first occurrence aged past the 1-hour watermark can be
    # re-emitted. What must hold:
    kept_gold = t1_golden[t1_golden.keep]
    merged = t1_golden.merge(
        got, on=["conv_id", "turn_idx"], suffixes=("_g", "_s"), how="inner"
    )
    # 1. every emitted row is a turn batch either kept, or dropped only
    #    as a duplicate (streaming picks first-arrival representatives),
    #    or dropped by the conv_stats rule — the ONE rule the stream
    #    deliberately neutralizes (global per-conversation aggregate,
    #    see _scored_stream). Per-row quality/scrub rejects never leak.
    assert len(merged) == len(got)
    ok = merged.keep | merged.reject_reason.isin(["duplicate", "conv_stats"])
    assert ok.all(), merged[~ok].head()
    # 2. where the winner coincides with batch's, the text is exact
    both = merged[merged.keep]
    assert (both.scrubbed_text_g == both.scrubbed_text_s).all()
    # 3. cardinality: at least one representative per distinct key
    #    (first arrival always emits; batch keeps exactly one per key),
    #    plus at most a few cross-watermark re-emissions / conv_stats
    #    leaks (t1 measures 1 of each)
    assert len(kept_gold) <= len(got) <= len(kept_gold) + 5

    # restart on the same checkpoint with no new input: no new rows
    n1 = len(got)
    q2 = start_filter_stream_to_table(spark, src, TBL, cp)
    q2.awaitTermination(300)
    assert spark.table(TBL).count() == n1

    # a new file arrives -> only the increment lands, as new batch ids
    max_bid = int(got["batch_id"].max())
    t = pq.read_table(ensure_transcripts("t1"))
    pq.write_table(t.slice(0, 50), BASE / "src" / "part-2.parquet")
    q3 = start_filter_stream_to_table(spark, src, TBL, cp)
    q3.awaitTermination(300)
    after = spark.table(TBL)
    inc = after.filter(F.col("batch_id") > max_bid)
    assert after.count() >= n1  # the increment may be fully deduped
    # whatever landed landed under NEW batch ids only
    assert after.count() - n1 == inc.count()


def test_batch_writer_replay_is_idempotent(spark, _env):
    """foreachBatch is at-least-once: a replayed (batch_id, data) pair —
    crash between table commit and checkpoint advance — must rewrite its
    partition, not append."""
    tio = TableIO(spark)
    fn = table_batch_writer(tio, TBL)
    batch = (
        spark.range(20)
        .withColumn("conv_id", F.concat(F.lit("c"), F.col("id")))
        .drop("id")
    )
    fn(batch, 7)
    n = spark.table(TBL).count()
    fn(batch, 7)  # replay
    assert spark.table(TBL).count() == n
    fn(batch, 8)  # a genuinely new batch appends its own partition
    assert spark.table(TBL).count() == 2 * n
    assert (
        spark.table(TBL).select("batch_id").distinct().count() == 2
    )


def test_stream_summary_counts_from_recent_progress():
    """ADVICE r4 (jobs/run_filter.py): the streaming summary must count
    batches from recentProgress (lastProgress can be None or just the
    final empty flush) and must flag an all-empty run that never created
    the table sink."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "jobs"))
    from run_filter import stream_summary

    class FakeQ:
        def __init__(self, progresses):
            self.recentProgress = progresses
            self.lastProgress = progresses[-1] if progresses else None

    # multi-batch run whose final batch is the empty watermark flush:
    # the old lastProgress-based line would report the flush batch only
    q = FakeQ([{"numInputRows": 5}, {"numInputRows": 3}, {"numInputRows": 0}])
    s = stream_summary(q, "tbl", table_missing=False)
    assert s["batches"] == 3 and s["batches_nonempty"] == 2
    assert "note" not in s

    # all-empty run with no table created -> explicit note, not silence
    s = stream_summary(FakeQ([{"numInputRows": 0}]), "tbl", table_missing=True)
    assert s["batches_nonempty"] == 0 and "never created" in s["note"]

    # no progress at all (lastProgress is None) -> batches=0, not null
    s = stream_summary(FakeQ([]), "tbl", table_missing=True)
    assert s["batches"] == 0 and "note" in s
