"""PII / profanity scrubber.

Runs exclusively on the Python ``re`` engine — inside the Arrow-batched
pandas UDF on the Spark side and directly in the oracle — so scrubbed text
is byte-identical by construction (SURVEY.md §7.3 hard-part 1: JVM
``regexp_replace`` dialect drift on lookbehinds/word-boundaries is the reason
we do NOT express these as native expressions).

Pattern order is load-bearing: EMAIL → SSN → SSN-9-digit → PHONE →
PROFANITY (an SSN must not be half-eaten by the phone pattern first).
"""

from __future__ import annotations

import pandas as pd

from . import spec


def scrub_text(text: str | None) -> str | None:
    if text is None:
        return None
    t = spec.EMAIL_RE.sub(spec.EMAIL_TOKEN, text)
    t = spec.SSN_RE.sub(spec.SSN_TOKEN, t)
    t = spec.SSN9_RE.sub(spec.SSN_TOKEN, t)
    t = spec.PHONE_RE.sub(spec.PHONE_TOKEN, t)
    t = spec.PROFANITY_RE.sub(spec.PROFANITY_TOKEN, t)
    return t


def scrub_series(texts: pd.Series) -> pd.Series:
    """Arrow-batch entry point (vectorized at the batch level)."""
    return texts.map(scrub_text, na_action="ignore")
