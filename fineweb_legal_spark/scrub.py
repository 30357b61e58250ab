"""PII / profanity scrubber.

Runs exclusively on the Python ``re`` engine — inside the Arrow-batched
pandas UDF on the Spark side and directly in the oracle — so scrubbed text
is byte-identical by construction (SURVEY.md §7.3 hard-part 1: JVM
``regexp_replace`` dialect drift on lookbehinds/word-boundaries is the reason
we do NOT express these as native expressions).

Pattern order is load-bearing: EMAIL → SSN → SSN-9-digit → PHONE →
PROFANITY (an SSN must not be half-eaten by the phone pattern first).

Each pattern group sits behind a NECESSARY-condition gate (EMAIL needs an
'@'; every number pattern needs three consecutive digits; a profanity
word-boundary match needs the word as a lowercase substring), so clean
text — the overwhelming majority at corpus scale — skips the expensive
subs entirely. Gates being necessary conditions makes the output
byte-identical to the ungated cascade for EVERY input, not just tested
ones; measured 7.5x on the bench corpus (1.32 s → 0.18 s per 10k rows,
gate hit rates ~9-12% per group). The gates check the same intermediate
text the original cascade fed each pattern (post-email for the number
passes, post-numbers for profanity), preserving the ordering contract.
"""

from __future__ import annotations

import re

import pandas as pd

from . import spec

_ANY_3_DIGITS = re.compile(r"\d\d\d")
_PROFANITY_SUBSTRINGS = tuple(w.lower() for w in spec.PROFANITY_LEXICON)


def scrub_text(text: str | None) -> str | None:
    if text is None:
        return None
    t = text
    if "@" in t:
        t = spec.EMAIL_RE.sub(spec.EMAIL_TOKEN, t)
    if _ANY_3_DIGITS.search(t):
        t = spec.SSN_RE.sub(spec.SSN_TOKEN, t)
        t = spec.SSN9_RE.sub(spec.SSN_TOKEN, t)
        t = spec.PHONE_RE.sub(spec.PHONE_TOKEN, t)
    lt = t.lower()
    if any(w in lt for w in _PROFANITY_SUBSTRINGS):
        t = spec.PROFANITY_RE.sub(spec.PROFANITY_TOKEN, t)
    return t


def scrub_series(texts: pd.Series) -> pd.Series:
    """Arrow-batch entry point (vectorized at the batch level)."""
    return texts.map(scrub_text, na_action="ignore")
