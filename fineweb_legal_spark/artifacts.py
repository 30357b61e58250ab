"""Broadcastable model artifacts: hashed char-trigram language-ID +
char-trigram perplexity LM.

Stand-ins for fastText lid.176 and a KenLM n-gram model (north_rule), built
deterministically from the embedded phrase banks — no downloads. The scoring
functions are pure numpy over Arrow/pandas batches and are shared verbatim by
the single-node oracle and the Spark pandas UDFs, so engine/oracle parity is
exact by construction.

Reference analog for the lifecycle (load once per executor, score in
vectorized batches): scripts/model_inference_stage2_cuda.py:143-191,232-303.
Here "load once" = a Spark broadcast variable holding two numpy tables.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import spec
from .corpus import LANG_SENTENCES

_HASH_SLOTS = 1 << spec.LANGID_HASH_BITS
_HASH_MASK = _HASH_SLOTS - 1


def trigram_hashes(text: str) -> np.ndarray:
    """Vectorized rolling polynomial hash of all char trigrams.

    Decodes codepoints via utf-32-le (fixed width -> alignment-safe for any
    unicode), then computes (c0*31^2 + c1*31 + c2) & mask with numpy slicing.
    Deterministic across processes (no PYTHONHASHSEED dependence).
    """
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    if cp.size < 3:
        return np.empty(0, dtype=np.int64)
    return (cp[:-2] * 961 + cp[1:-1] * 31 + cp[2:]) & _HASH_MASK


@dataclass(frozen=True)
class ModelArtifacts:
    """What gets broadcast to executors: two dense log-prob tables."""

    langid_logprob: np.ndarray  # float32 [n_langs, 2^16]
    ppl_logprob: np.ndarray  # float32 [2^16]
    langs: tuple[str, ...]

    def predict_lang(self, text: str) -> str:
        h = trigram_hashes(text[: spec.LANGID_PREFIX_CHARS].lower())
        if h.size == 0:
            return spec.LANGID_KEEP_LANG
        scores = self.langid_logprob[:, h].sum(axis=1)
        return self.langs[int(np.argmax(scores))]

    def perplexity(self, text: str) -> float:
        h = trigram_hashes(text[: spec.PPL_PREFIX_CHARS].lower())
        if h.size == 0:
            return 1.0
        return float(np.exp(-self.ppl_logprob[h].mean()))

    @staticmethod
    def ppl_bucket(ppl: float) -> int:
        return min(int(ppl / spec.PPL_BUCKET_WIDTH), spec.PPL_BUCKET_MAX)


def _counts_for(sentences: tuple[str, ...]) -> np.ndarray:
    counts = np.zeros(_HASH_SLOTS, dtype=np.float64)
    for s in sentences:
        h = trigram_hashes(s.lower())
        np.add.at(counts, h, 1.0)
    return counts


def build_artifacts() -> ModelArtifacts:
    """Deterministic build (pure function of the embedded corpus)."""
    langs = spec.LANGID_LANGS
    lid = np.zeros((len(langs), _HASH_SLOTS), dtype=np.float64)
    for i, lang in enumerate(langs):
        c = _counts_for(LANG_SENTENCES[lang])
        lid[i] = np.log((c + 0.5) / (c.sum() + 0.5 * _HASH_SLOTS))
    c_en = _counts_for(LANG_SENTENCES["en"])
    ppl = np.log((c_en + 0.5) / (c_en.sum() + 0.5 * _HASH_SLOTS))
    return ModelArtifacts(
        langid_logprob=lid.astype(np.float32),
        ppl_logprob=ppl.astype(np.float32),
        langs=tuple(langs),
    )


_CACHED: ModelArtifacts | None = None


def get_artifacts() -> ModelArtifacts:
    global _CACHED
    if _CACHED is None:
        _CACHED = build_artifacts()
    return _CACHED
