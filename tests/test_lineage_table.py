"""Catalog-table lineage backend (lineage_table.py): the directory
protocol's kill/resume contract, re-expressed as Iceberg-shaped
overwrite-partitions commits on catalog tables."""

from __future__ import annotations

import pytest

from fineweb_legal_spark import spec
from fineweb_legal_spark.lineage_table import (
    committed_buckets_table,
    read_committed_table,
    read_lineage_table,
    run_with_lineage_table,
)

DATA_T = "lintbl_data"
LIN_T = "lintbl_lineage"


@pytest.fixture()
def _tables(spark):
    for t in (DATA_T, LIN_T):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    yield
    for t in (DATA_T, LIN_T):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_kill_resume_idempotent_on_tables(spark, t1_transcripts, t1_golden, _tables):
    # simulated kill: only 2 of 4 commit groups run
    r1 = run_with_lineage_table(
        spark, t1_transcripts, DATA_T, LIN_T, n_groups=4, max_groups=2
    )
    assert r1["groups_processed"] == 2
    n_committed = len(committed_buckets_table(spark, LIN_T))
    assert 0 < n_committed < spec.LINEAGE_BUCKETS
    partial_rows = read_committed_table(spark, DATA_T, LIN_T).count()

    # resume completes only the remaining buckets
    r2 = run_with_lineage_table(spark, t1_transcripts, DATA_T, LIN_T, n_groups=4)
    assert r2["committed_before"] == n_committed
    assert len(committed_buckets_table(spark, LIN_T)) == spec.LINEAGE_BUCKETS

    out = read_committed_table(spark, DATA_T, LIN_T).toPandas()
    assert len(out) > partial_rows
    kept_gold = t1_golden[t1_golden.keep]
    assert len(out) == len(kept_gold)
    assert not out.duplicated(subset=["conv_id", "turn_idx"]).any()
    merged = kept_gold.merge(
        out, on=["conv_id", "turn_idx"], suffixes=("_g", "_s"), how="inner"
    )
    assert len(merged) == len(kept_gold)
    assert (merged.scrubbed_text_g == merged.scrubbed_text_s).all()

    # lineage metrics add up to the full corpus
    lin = read_lineage_table(spark, LIN_T).toPandas()
    assert len(lin) == spec.LINEAGE_BUCKETS  # replay produced no dup rows
    assert int(lin.kept.sum()) == len(kept_gold)
    assert int((lin.kept + lin.dropped).sum()) == len(t1_golden)
    assert (lin.status == "committed").all()
    assert lin.committed_at.notna().all()

    # rerun of a completed job is a no-op
    r3 = run_with_lineage_table(spark, t1_transcripts, DATA_T, LIN_T, n_groups=4)
    assert r3["groups_processed"] == 0


def test_replayed_group_rewrites_not_duplicates(spark, t1_transcripts, t1_golden, _tables):
    """Forcing the same group through commit twice (the crashed-between-
    data-and-lineage window, or a task retry at the job level) must
    converge: partition overwrite replaces, never appends."""
    run_with_lineage_table(
        spark, t1_transcripts, DATA_T, LIN_T, n_groups=4, max_groups=2
    )
    first = read_committed_table(spark, DATA_T, LIN_T).toPandas()

    # drop the lineage rows for one committed bucket — simulates a kill
    # BETWEEN the data write and the lineage write: data is visible in
    # the table but the bucket must count as uncommitted and recompute
    some_bucket = int(first.bucket.iloc[0])
    spark.sql(
        f"ALTER TABLE {LIN_T} DROP PARTITION (bucket={some_bucket})"
    )
    assert some_bucket not in committed_buckets_table(spark, LIN_T)

    run_with_lineage_table(spark, t1_transcripts, DATA_T, LIN_T, n_groups=4)
    out = read_committed_table(spark, DATA_T, LIN_T).toPandas()
    kept_gold = t1_golden[t1_golden.keep]
    assert len(out) == len(kept_gold)
    assert not out.duplicated(subset=["conv_id", "turn_idx"]).any()
    lin = read_lineage_table(spark, LIN_T).toPandas()
    assert len(lin) == spec.LINEAGE_BUCKETS
