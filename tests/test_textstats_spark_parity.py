"""Cross-engine property check: native Column feature expressions in
pipeline.heuristic_features must equal textstats (the oracle's definitions)
on a randomized corpus covering whitespace/symbol/unicode edge cases.
"""

from __future__ import annotations

import random

import pandas as pd

from fineweb_legal_spark import textstats
from fineweb_legal_spark.pipeline import heuristic_features

_ALPHABET = (
    list("abcdefgh XYZ012{}[]<>|\\^~`$%@*=_+/#.,!?")
    + [" ", " ", "\t", "\n", "\n", "é", "ü", "漢", "'", '"']
)


def _random_texts(n: int, seed: int = 7) -> list[str | None]:
    rng = random.Random(seed)
    out: list[str | None] = [None, "", " ", "\n", "\t\n  \t", "a", "  a  ",
                             "a\n\nb", " x \n y ", "one two  three"]
    for _ in range(n):
        ln = rng.randint(1, 400)
        out.append("".join(rng.choice(_ALPHABET) for _ in range(ln)))
    return out


def test_features_match_textstats(spark):
    texts = _random_texts(300)
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(len(texts))],
            "turn_idx": list(range(len(texts))),
            "text": pd.array(texts, dtype="string"),
        }
    )
    df = spark.createDataFrame(pdf)
    got = heuristic_features(df).toPandas().set_index("turn_idx").sort_index()

    for i, t in enumerate(texts):
        row = got.loc[i]
        if t is None:
            assert pd.isna(row["n_chars"])
            continue
        assert row["n_chars"] == len(t), (i, repr(t))
        assert row["word_count"] == textstats.word_count(t), (i, repr(t))
        mwl = textstats.mean_word_len(t)
        if mwl is None:
            assert pd.isna(row["mean_word_len"]), (i, repr(t))
        else:
            assert abs(row["mean_word_len"] - mwl) == 0.0, (i, repr(t))
        assert row["stop_count"] == textstats.stopword_count(t), (i, repr(t))
        dwr = textstats.distinct_word_ratio(t)
        if dwr is None:
            assert pd.isna(row["distinct_word_ratio"]), (i, repr(t))
        else:
            assert abs(row["distinct_word_ratio"] - dwr) == 0.0, (i, repr(t))
        lines = textstats.nonempty_lines(t)
        assert row["line_count"] == len(lines), (i, repr(t))
        dlf = textstats.dup_line_fraction(t)
        if dlf is None:
            assert pd.isna(row["dup_line_fraction"]), (i, repr(t))
        else:
            assert abs(row["dup_line_fraction"] - dlf) == 0.0, (i, repr(t))
        assert row["symbol_count"] == textstats.symbol_count(t), (i, repr(t))
