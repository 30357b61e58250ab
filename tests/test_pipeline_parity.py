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


def test_corpus_report_matches_golden_pandas(spark, t1_golden):
    """Data card totals recomputed single-node from the golden parquet."""
    import numpy as np

    from fineweb_legal_spark.datasets import ensure_transcripts
    from fineweb_legal_spark.pipeline import run_pipeline
    from fineweb_legal_spark.report import corpus_report

    v = run_pipeline(
        spark, spark.read.parquet(str(ensure_transcripts("t1")))
    )
    card = corpus_report(v)
    g = t1_golden
    assert card["turns"] == len(g)
    assert card["kept_turns"] == int(g["keep"].sum())
    assert card["kept_frac"] == round(g["keep"].mean(), 6)
    want_rejects = g["reject_reason"].dropna().value_counts().to_dict()
    assert card["rejects"] == want_rejects
    assert card["reject_other"] == 0
    kept = g[g["keep"]]
    lens = kept["scrubbed_text"].str.len()
    assert card["kept_chars"] == int(lens.sum())
    assert card["kept_tok_est"] == int(
        np.maximum(1, np.floor(lens / 4)).sum()
    )
    assert card["kept_mean_chars"] == round(float(lens.mean()), 2)
    assert card["lang_mix"] == (
        g["lang"].dropna().value_counts().sort_index().to_dict()
    )
    assert card["ppl_histogram"] == {
        int(k): v
        for k, v in g["ppl_bucket"].dropna().value_counts().sort_index().items()
    }
    assert card["verdicts_present"] is True
    # released-corpus mode: kept rows only, no keep/reject_reason columns
    # (the lineage-committed output schema) — every row counts as kept,
    # attribution is empty and flagged absent, kept totals unchanged
    released = v.filter("keep").drop("keep", "reject_reason")
    rcard = corpus_report(released)
    assert rcard["verdicts_present"] is False
    assert rcard["turns"] == rcard["kept_turns"] == card["kept_turns"]
    assert rcard["kept_frac"] == 1.0
    assert rcard["rejects"] == {} and rcard["reject_other"] == 0
    assert rcard["kept_chars"] == card["kept_chars"]
    assert rcard["kept_tok_est"] == card["kept_tok_est"]


def test_merge_cards_equals_full_card(spark):
    """Per-shard cards folded with merge_cards reproduce the full-corpus
    card exactly (conversations_approx: sum of conv-disjoint shards)."""
    import pytest

    from fineweb_legal_spark.datasets import ensure_transcripts
    from fineweb_legal_spark.pipeline import run_pipeline
    from fineweb_legal_spark.report import corpus_report, merge_cards

    v = run_pipeline(
        spark, spark.read.parquet(str(ensure_transcripts("t1")))
    ).cache()
    try:
        full = corpus_report(v)
        # conv-disjoint split (never slices a conversation)
        a = v.filter("crc32(conv_id) % 2 = 0")
        b = v.filter("crc32(conv_id) % 2 = 1")
        merged = merge_cards([corpus_report(a), corpus_report(b)])
        assert merged.pop("conversations_merge")
        approx_merged = merged.pop("conversations_approx")
        approx_full = full.pop("conversations_approx")
        # HLL of the union != sum of disjoint HLLs, but both approximate
        # the same true count (rsd default 5%)
        assert abs(approx_merged - approx_full) / approx_full < 0.15
        assert merged == full
    finally:
        v.unpersist()
    with pytest.raises(ValueError):
        merge_cards([])
