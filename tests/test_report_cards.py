"""Pure-Python card algebra tests (merge_cards / diff_cards): no
SparkSession — these run in milliseconds and pin the release-gate math
independently of the Spark-side card equivalence test in
test_pipeline_parity.py."""

from __future__ import annotations

import math

import pytest

from fineweb_legal_spark.report import _js_divergence, diff_cards, merge_cards


def _card(
    turns=1000,
    kept=400,
    rejects=None,
    lang=None,
    ppl=None,
    convs=100,
    chars=10_000,
    tok=2_500,
):
    rejects = {"length": 300, "lang": 300} if rejects is None else rejects
    lang = {"en": 900, "de": 100} if lang is None else lang
    ppl = {10: 500, 20: 500} if ppl is None else ppl
    return {
        "verdicts_present": True,
        "turns": turns,
        "conversations_approx": convs,
        "kept_turns": kept,
        "kept_frac": round(kept / turns, 6),
        "rejects": rejects,
        "reject_other": turns - kept - sum(rejects.values()),
        "kept_chars": chars,
        "kept_tok_est": tok,
        "kept_mean_chars": round(chars / kept, 2),
        "lang_mix": lang,
        "ppl_histogram": ppl,
    }


def test_merge_is_associative_and_identity_on_single():
    a, b, c = _card(), _card(turns=500, kept=100, chars=2000, tok=500), _card()
    left = merge_cards([merge_cards([a, b]), c])
    right = merge_cards([a, merge_cards([b, c])])
    # the merge marker nests but the numbers must associate exactly
    left.pop("conversations_merge"), right.pop("conversations_merge")
    assert left == right
    single = merge_cards([a])
    single.pop("conversations_merge")
    want = dict(a)
    # re-derived means can differ from the input's only by rounding
    assert single == {**want, "kept_mean_chars": single["kept_mean_chars"]}
    assert abs(single["kept_mean_chars"] - want["kept_mean_chars"]) < 0.01


def test_diff_cards_identical_is_clean():
    d = diff_cards(_card(), _card())
    assert d["ok"] is True
    assert d["kept_frac_drift"] == 0.0
    assert d["max_lang_share_drift"] == 0.0
    assert d["ppl_js_divergence"] == 0.0


def test_diff_cards_flags_each_drift_axis():
    base = _card()
    # kept fraction collapse
    assert diff_cards(base, _card(kept=200))["ok"] is False
    # language mix shift (en 0.9 -> 0.5)
    shifted = _card(lang={"en": 500, "de": 500})
    d = diff_cards(base, shifted)
    assert d["ok"] is False and d["max_lang_share_drift"] == 0.4
    # a NEW language appears at 10%: drift is its full share
    novel = _card(lang={"en": 900, "fr": 100})
    assert diff_cards(base, novel)["lang_share_drifts"]["fr"] == 0.1
    # ppl histogram moved wholesale
    moved = _card(ppl={40: 500, 50: 500})
    d = diff_cards(base, moved)
    assert d["ok"] is False and d["ppl_js_divergence"] == 1.0
    # thresholds ship with the verdict
    loose = diff_cards(base, moved, max_ppl_js=1.0, max_kept_frac_drift=1.0,
                       max_lang_share_drift=1.0)
    assert loose["ok"] is True


def test_js_divergence_properties():
    p, q = {1: 3, 2: 1}, {1: 1, 2: 3}
    assert _js_divergence(p, p) == 0.0
    assert _js_divergence(p, q) == pytest.approx(_js_divergence(q, p))
    assert 0.0 < _js_divergence(p, q) < 1.0
    # disjoint supports saturate at 1 bit
    assert _js_divergence({1: 5}, {2: 5}) == pytest.approx(1.0)
    # hand value: p=(1,0), q=(0.5,0.5) -> JS = 1 - 0.5*log2... compute:
    # m=(0.75,0.25); JS = 0.5*(1*log2(1/0.75)) + 0.5*(0.5*log2(0.5/0.75)
    # + 0.5*log2(0.5/0.25))
    want = 0.5 * math.log2(1 / 0.75) + 0.5 * (
        0.5 * math.log2(0.5 / 0.75) + 0.5 * math.log2(0.5 / 0.25)
    )
    assert _js_divergence({1: 4}, {1: 2, 2: 2}) == pytest.approx(want)
    assert _js_divergence({}, {}) == 0.0
    assert _js_divergence({1: 1}, {}) == 1.0


def test_merge_cards_rejects_empty():
    with pytest.raises(ValueError):
        merge_cards([])
