"""Determinism + sanity of the broadcastable model artifacts."""

from __future__ import annotations

import numpy as np

from fineweb_legal_spark import spec
from fineweb_legal_spark.artifacts import build_artifacts, trigram_hashes
from fineweb_legal_spark.corpus import LANG_SENTENCES


def test_build_is_deterministic():
    a, b = build_artifacts(), build_artifacts()
    assert np.array_equal(a.langid_logprob_t, b.langid_logprob_t)
    assert np.array_equal(a.ppl_logprob, b.ppl_logprob)


def test_langid_bank_accuracy_is_perfect():
    a = build_artifacts()
    for lang, sents in LANG_SENTENCES.items():
        for s in sents:
            assert a.predict_lang(s) == lang


def test_ppl_separates_english_from_rest():
    a = build_artifacts()
    en = max(a.perplexity(s) for s in LANG_SENTENCES["en"])
    de = min(a.perplexity(s) for s in LANG_SENTENCES["de"])
    assert en <= spec.PPL_MAX < de


def test_trigram_hashes_unicode_and_short():
    assert trigram_hashes("ab").size == 0
    h = trigram_hashes("héllo 漢字!")
    assert h.size == len("héllo 漢字!") - 2
    assert (h >= 0).all() and (h < (1 << spec.LANGID_HASH_BITS)).all()


def test_ppl_bucket_clamps():
    a = build_artifacts()
    assert a.ppl_bucket(0.0) == 0
    assert a.ppl_bucket(1e9) == spec.PPL_BUCKET_MAX
