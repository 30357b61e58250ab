"""Determinism + sanity of the broadcastable model artifacts."""

from __future__ import annotations

import numpy as np

from fineweb_legal_spark import spec
from fineweb_legal_spark.artifacts import build_artifacts, trigram_hashes
from fineweb_legal_spark.corpus import LANG_SENTENCES


def test_build_is_deterministic():
    a, b = build_artifacts(), build_artifacts()
    assert np.array_equal(a.langid_logprob, b.langid_logprob)
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


def _py_trigrams(text: str, prefix: int) -> list[int]:
    """Independent pure-Python re-statement of the trigram hash (no numpy,
    no shared code): (c0*31^2 + c1*31 + c2) mod 2^LANGID_HASH_BITS over the
    lowercased prefix."""
    t = text[:prefix].lower()
    mask = (1 << spec.LANGID_HASH_BITS) - 1
    return [
        (ord(t[i]) * 961 + ord(t[i + 1]) * 31 + ord(t[i + 2])) & mask
        for i in range(len(t) - 2)
    ]


def test_scoring_matches_independent_python_reimplementation():
    """Model-semantics spot check independent of the vectorized kernels:
    language-ID and perplexity recomputed with plain Python loops over the
    same log-prob tables must equal the batch kernels exactly."""
    import math

    a = build_artifacts()
    samples = [
        "The quick brown fox jumps over the lazy dog near the river bank.",
        "Der schnelle braune Fuchs springt über den faulen Hund am Fluss.",
        "El rápido zorro marrón salta sobre el perro perezoso del río.",
        "xq zv 漢字 7#!",
    ]
    for s in samples:
        tri = _py_trigrams(s, spec.LANGID_PREFIX_CHARS)
        if tri:
            sums = [
                sum(float(a.langid_logprob[i][h]) for h in tri)
                for i in range(len(a.langs))
            ]
            expect_lang = a.langs[sums.index(max(sums))]
        else:
            expect_lang = spec.LANGID_KEEP_LANG
        assert a.predict_lang(s) == expect_lang, s

        tri_p = _py_trigrams(s, spec.PPL_PREFIX_CHARS)
        if tri_p:
            lp = sum(float(a.ppl_logprob[h]) for h in tri_p)
            expect_ppl = math.exp(-(lp / len(tri_p)))
        else:
            expect_ppl = 1.0
        assert abs(a.perplexity(s) - expect_ppl) < 1e-9, s


def test_ppl_bucket_clamps():
    a = build_artifacts()
    assert a.ppl_bucket(0.0) == 0
    assert a.ppl_bucket(1e9) == spec.PPL_BUCKET_MAX
