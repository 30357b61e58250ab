"""The correctness gate: Spark pipeline == pandas oracle, exactly.

FIXTURES.md §4 invariants 1-4: exact scrubbed text under stable ordering,
keep/drop F1 (target 1.0), no duplicate keys, ranges respected.
"""

from __future__ import annotations

from fineweb_legal_spark import spec
from fineweb_legal_spark.pipeline import run_pipeline, stage_metrics

VERDICT_COLS = ["keep", "reject_reason", "scrubbed_text", "lang", "ppl_bucket"]


def test_exact_parity_with_oracle(t1_verdicts, t1_golden):
    v = t1_verdicts
    merged = t1_golden.merge(v, on=["conv_id", "turn_idx"], suffixes=("_g", "_s"))
    assert len(merged) == len(t1_golden) == len(v)
    for col in VERDICT_COLS:
        a, b = merged[col + "_g"], merged[col + "_s"]
        neq = ~((a.isna() & b.isna()) | (a == b))
        assert int(neq.sum()) == 0, f"{col}: {merged[neq].head()}"


def test_keep_f1_at_least_099(t1_verdicts, t1_golden):
    m = t1_golden.merge(t1_verdicts, on=["conv_id", "turn_idx"], suffixes=("_g", "_s"))
    tp = int((m.keep_g & m.keep_s).sum())
    fp = int((~m.keep_g & m.keep_s).sum())
    fn = int((m.keep_g & ~m.keep_s).sum())
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, f1


def test_no_duplicate_keys_and_ranges(t1_verdicts):
    v = t1_verdicts
    assert not v.duplicated(subset=["conv_id", "turn_idx"]).any()
    reasons = set(v["reject_reason"].dropna().unique())
    assert reasons <= set(spec.STAGES)
    b = v["ppl_bucket"].dropna()
    assert ((b >= 0) & (b <= spec.PPL_BUCKET_MAX)).all()
    # kept rows always carry scrubbed text; dropped rows never do
    assert v.loc[v.keep, "scrubbed_text"].notna().all()
    assert v.loc[~v.keep, "scrubbed_text"].isna().all()


def test_stage_metrics_cover_all_rows(spark, t1_transcripts):
    m = stage_metrics(run_pipeline(spark, t1_transcripts)).toPandas()
    assert int(m["turns"].sum()) == t1_transcripts.count()
    assert "kept" in set(m["stage"])
