"""Pure-Python per-text heuristic features — the oracle's semantics.

The Spark engine implements the SAME definitions as native Column
expressions (fineweb_legal_spark.pipeline.heuristic_columns); the pytest
fixture matrix asserts exact agreement between the two on every generated
turn. Definitions are chosen so that the Python-re and Java-regex dialects
coincide (ASCII-explicit classes; no bare ``\\s`` ambiguity beyond the
whitespace chars the generator can emit).
"""

from __future__ import annotations

import hashlib
import re

from . import spec

# explicit ASCII whitespace class — identical byte semantics in Python `re`
# and Java regex (bare \s is unicode-aware in Python but ASCII in Java)
WS_CLASS = "[ \t\n\r\f\x0b]"
_WS_SPLIT = re.compile(WS_CLASS + "+")
_LINE_EDGE = re.compile(r"^[ \t]+|[ \t]+$")
_SYMBOL = re.compile(spec.SYMBOL_CLASS_RE)


def tokens(text: str) -> list[str]:
    return [t for t in _WS_SPLIT.split(text) if t]


def word_count(text: str) -> int:
    return len(tokens(text))


def mean_word_len(text: str) -> float | None:
    ts = tokens(text)
    if not ts:
        return None
    return sum(len(t) for t in ts) / len(ts)


def stopword_count(text: str) -> int:
    return sum(1 for t in tokens(text) if t.lower() in spec.STOPWORDS)


def distinct_word_ratio(text: str) -> float | None:
    ts = [t.lower() for t in tokens(text)]
    if not ts:
        return None
    return len(set(ts)) / len(ts)


def nonempty_lines(text: str) -> list[str]:
    out = []
    for line in text.split("\n"):
        line = _LINE_EDGE.sub("", line)
        if line:
            out.append(line)
    return out


def dup_line_fraction(text: str) -> float | None:
    lines = nonempty_lines(text)
    if not lines:
        return None
    return 1.0 - len(set(lines)) / len(lines)


def symbol_count(text: str) -> int:
    return len(_SYMBOL.findall(text))


def norm_text(text: str) -> str:
    """Dedup normalization: strip + lower (storage.py:33-36 analog).

    Runs ONLY in Python (oracle and the pandas-UDF model stage), so Python
    ``str.strip`` semantics are authoritative on both sides.
    """
    return text.strip().lower()


def norm_hash(text: str) -> str:
    return hashlib.md5(norm_text(text).encode("utf-8")).hexdigest()
