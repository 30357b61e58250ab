"""Deterministic synthetic multi-turn transcripts generator.

Produces the `transcripts` table per BASELINE.json `input_hint`:
(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp) with the FIXTURES.md content mix — every filter/scrub branch
is exercised, conversation sizes are Zipfian with one giant conversation,
and some conversations are written to disk in shuffled row order so stable
ordering must come from `turn_idx`.

Seeded numpy RandomState; no wall-clock, no external data.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from .corpus import LANG_SENTENCES

_EPOCH = dt.datetime(2025, 1, 1, 0, 0, 0)

_CONTENT_WORDS = (
    "table window spark query filter merge column vector batch stream "
    "kernel tensor branch packet socket buffer thread mutex queue stack "
    "parser lexer token symbol schema index cursor driver module handler"
).split()

_GIBBERISH_ALPHA = "abcdefghijklmnopqrstuvwxyz"

_PROFANITY_SENTS = (
    "Damn, the build failed again and I have no idea why.",
    "This legacy parser sucks and the docs are worse.",
    "Well hell, that migration script just dropped the staging table.",
    "Only an idiot would ship that config on a Friday afternoon.",
    "The shellfish restaurant near the hotel was actually quite good.",
    "Say hello to the new intern who joined the platform team today.",
    "She reinstalled the whole toolchain and felt much better afterwards.",
    "CRAP, I pasted the wrong snippet into the production console.",
)

_PII_SNIPPETS = (
    "You can reach me at jane.doe@example.com for the follow-up.",
    "Forward the invoice to billing+acme@corp-mail.example.org today.",
    "Call me at (415) 555-0134 before the standup tomorrow morning.",
    "The on-call number is 212-555-0188 if the pager does not fire.",
    "Her SSN on the form reads 123-45-6789 which we must redact.",
    "The legacy record stored it as 987654321 in a plain column.",
    "We upgraded to version 1.2.3-45-6789 of the ingestion service.",
    "The ISBN 9780262033848 identifies the algorithms textbook.",
    "Dial +1 650 555 0101 or email ops@pager.example.net immediately.",
    "His backup line 650.555.042 is missing a digit so it stays.",
)

_TOOL_NAMES = ("search", "browser", "calculator", "python", "sql", "shell")

_DUP_POOL = (
    "The deployment pipeline finished successfully and all the smoke tests passed on the first attempt.",
    "Please review the quarterly report draft and send me your comments by the end of the week.",
    "The cache invalidation bug was fixed by clearing the stale entries before every write operation.",
    "Our migration to the new storage backend completed without any data loss or downtime.",
)


def _sent(rng: np.random.RandomState, lang: str = "en") -> str:
    bank = LANG_SENTENCES[lang]
    return bank[rng.randint(len(bank))]


def _sents(rng, n: int, lang: str = "en", sep: str = " ") -> str:
    return sep.join(_sent(rng, lang) for _ in range(n))


def _gibberish_word(rng) -> str:
    return "".join(_GIBBERISH_ALPHA[rng.randint(26)] for _ in range(rng.randint(3, 10)))


def _make_text(rng: np.random.RandomState, kind: str) -> str | None:
    if kind == "good_prose":
        n = rng.randint(2, 7)
        sep = "\n" if rng.rand() < 0.2 else " "
        return _sents(rng, n, "en", sep)
    if kind == "short":
        return _sent(rng)[: rng.randint(1, 25)]
    if kind == "too_long":
        s = _sents(rng, 4)
        reps = 20_001 // len(s) + 2
        return " ".join([s] * reps)
    if kind == "salad_nostop":
        n = rng.randint(12, 60)
        return " ".join(_CONTENT_WORDS[rng.randint(len(_CONTENT_WORDS))] for _ in range(n))
    if kind == "repeated_lines":
        line = _sent(rng)
        uniq = _sent(rng)
        reps = rng.randint(6, 12)
        return "\n".join([line] * reps + [uniq])
    if kind == "low_distinct":
        words = ["the", "data", "is", "in", "the", "table"]
        return " ".join(words * rng.randint(8, 20))
    if kind == "symbol_code":
        base = _sent(rng)
        sym = "{}[]<>|=#$%@*_/\\^~`" * rng.randint(3, 8)
        return f"{base} {sym} {{\"k\": [1, 2, 3], \"v\": {{}}}} #### ===="
    if kind == "non_en":
        lang = ("es", "fr", "de", "it")[rng.randint(4)]
        return _sents(rng, rng.randint(2, 5), lang)
    if kind == "non_en_mixed":
        lang = ("es", "fr", "de", "it")[rng.randint(4)]
        body = _sents(rng, rng.randint(2, 5), lang)
        return f"the {body} and {body.split()[0]} of it"
    if kind == "en_noisy":
        words = _sents(rng, 4).split()
        for i in range(0, len(words), 2):
            words[i] = _gibberish_word(rng)
        return " ".join(words)
    if kind == "pii":
        base = _sents(rng, rng.randint(2, 4))
        k = rng.randint(1, 4)
        picks = [_PII_SNIPPETS[rng.randint(len(_PII_SNIPPETS))] for _ in range(k)]
        return base + " " + " ".join(picks)
    if kind == "profanity":
        base = _sents(rng, rng.randint(1, 3))
        return base + " " + _PROFANITY_SENTS[rng.randint(len(_PROFANITY_SENTS))]
    if kind == "dup_pool":
        t = _DUP_POOL[rng.randint(len(_DUP_POOL))]
        t = t + " " + _DUP_POOL[rng.randint(len(_DUP_POOL))]
        style = rng.randint(4)
        if style == 1:
            t = t.upper()
        elif style == 2:
            t = "   " + t + "  \t"
        elif style == 3:
            t = t.lower()
        return t
    if kind == "empty":
        return "" if rng.rand() < 0.5 else None
    if kind == "tool_json":
        rows = rng.randint(2, 6)
        cells = ", ".join(f'{{"id": {rng.randint(1000)}, "ok": true}}' for _ in range(rows))
        return f'[{cells}]'
    if kind == "long_words":
        # mean word length > 12 (hash/URL-blob turns) -> word_stats reject
        n = rng.randint(5, 12)
        return " ".join(
            "".join(_GIBBERISH_ALPHA[rng.randint(26)] for _ in range(rng.randint(14, 22)))
            for _ in range(n)
        )
    if kind == "few_words":
        # >= 25 chars but < 5 words -> word_stats reject
        return "Acknowledged confirmed unconditionally."
    if kind == "terse":
        words = [_CONTENT_WORDS[rng.randint(len(_CONTENT_WORDS))] for _ in range(5)]
        return "note " + " ".join(words)  # ~30 chars, ~6 words
    raise ValueError(kind)


_TURN_KINDS = (
    ("good_prose", 0.30),
    ("long_words", 0.02),
    ("few_words", 0.02),
    ("short", 0.05),
    ("too_long", 0.01),
    ("salad_nostop", 0.05),
    ("repeated_lines", 0.05),
    ("low_distinct", 0.03),
    ("symbol_code", 0.05),
    ("non_en", 0.08),
    ("non_en_mixed", 0.06),
    ("en_noisy", 0.05),
    ("pii", 0.08),
    ("profanity", 0.04),
    ("dup_pool", 0.05),
    ("empty", 0.02),
    ("tool_json", 0.04),
)
_KIND_NAMES = tuple(k for k, _ in _TURN_KINDS)
_KIND_P = np.array([p for _, p in _TURN_KINDS])
_KIND_P = _KIND_P / _KIND_P.sum()


def generate_transcripts(n_turns: int, seed: int = 42) -> pd.DataFrame:
    """Deterministic transcripts table with ~n_turns rows."""
    rng = np.random.RandomState(seed)

    # conversation size plan: one giant conv (~10% of turns), Zipfian rest,
    # many singletons
    sizes: list[int] = []
    giant = max(4, n_turns // 10)
    sizes.append(giant)
    remaining = n_turns - giant
    while remaining > 0:
        z = int(min(rng.zipf(1.6), 60))
        z = min(z, remaining)
        sizes.append(z)
        remaining -= z

    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    for ci, size in enumerate(sizes):
        conv_id = f"conv_{ci:08d}"
        terse_conv = size >= 3 and rng.rand() < 0.06  # conv_stats reject path
        conv_base = _EPOCH + dt.timedelta(hours=ci % 100_000)
        for ti in range(size):
            if terse_conv:
                kind = "terse"
            else:
                kind = _KIND_NAMES[rng.choice(len(_KIND_NAMES), p=_KIND_P)]
            if kind == "tool_json":
                role, tool = "tool", _TOOL_NAMES[rng.randint(len(_TOOL_NAMES))]
            elif ti == 0 and rng.rand() < 0.15:
                role, tool = "system", None
            else:
                role, tool = ("user", None) if ti % 2 == 0 else ("assistant", None)
            conv_ids.append(conv_id)
            turn_idxs.append(ti)
            roles.append(role)
            texts.append(_make_text(rng, kind))
            tools.append(tool)
            tss.append(conv_base + dt.timedelta(seconds=60 * ti))

    df = pd.DataFrame(
        {
            "conv_id": pd.array(conv_ids, dtype="string"),
            "turn_idx": np.array(turn_idxs, dtype=np.int32),
            "role": pd.array(roles, dtype="string"),
            "text": pd.array(texts, dtype="string"),
            "tool": pd.array(tools, dtype="string"),
            "ts": pd.to_datetime(tss),
        }
    )

    # shuffle on-disk row order for a third of conversations (ordering must
    # come from turn_idx, never arrival order)
    perm = rng.permutation(len(df))
    df = df.iloc[perm].reset_index(drop=True)
    # ...but keep it deterministic: stable overall by a synthetic storage key
    return df


def generate_webdocs(n_docs: int, seed: int = 43) -> pd.DataFrame:
    """Reference stage-1-shaped table (id, text, url) — FIXTURES.md §3.

    Exercises the web-document filter parity suite: news URLs, boilerplate
    in head/tail/middle windows, keyword-count gradient 0/1/2/many in the
    first 5,000 chars, citation patterns inside and beyond the 8,000-char
    window.
    """
    from . import spec

    rng = np.random.RandomState(seed)
    ids, texts, urls = [], [], []
    filler = " ".join(LANG_SENTENCES["en"])  # ~2,900 chars of clean prose

    def pad_to(base: str, n: int) -> str:
        while len(base) < n:
            base = base + " " + filler
        return base[:n]

    for i in range(n_docs):
        ids.append(f"doc_{i:08d}")
        case = rng.randint(10)
        kws = list(spec.QUALITY_KEYWORDS)
        cite = "See Roe v. Wade, 410 U.S. 113, and 42 U.S.C. § 1983 for details."
        base = (
            f"The court considered whether the {kws[rng.randint(len(kws))]} had standing. "
            f"The {kws[rng.randint(len(kws))]} argued that {kws[rng.randint(len(kws))]} applied. "
            + cite + " " + filler
        )
        if case == 0:  # too short
            text = base[: rng.randint(10, 499)]
        elif case == 1:  # too long
            text = pad_to(base, 50_001 + rng.randint(5_000))
        elif case == 2:  # boilerplate in head -> reject
            text = "We use cookies and our privacy policy applies. " + pad_to(base, 3_000)
        elif case == 3:  # boilerplate only in tail -> reject
            text = pad_to(filler + " " + base, 2_500) + " All rights reserved."
        elif case == 4:  # boilerplate only in the MIDDLE -> must PASS
            mid = pad_to(base, 1_200) + " subscribe to our newsletter " + pad_to(filler + " " + cite, 1_500)
            text = mid
        elif case == 5:  # zero keywords -> reject
            text = pad_to(filler, 2_000)
        elif case == 6:  # exactly one keyword -> reject (threshold 2)
            text = pad_to("The plaintiff appeared. " + filler, 2_000)
        elif case == 7:  # keywords only after char 5000 -> reject
            text = pad_to(filler, 5_100) + " plaintiff defendant statute " + cite
        elif case == 8:  # citation only after char 8000 -> reject
            text = pad_to("plaintiff defendant liability damages " + filler, 8_200) + " " + cite
        else:  # clean pass
            text = pad_to(base, 600 + rng.randint(4_000))
        if rng.rand() < 0.25:
            host = spec.NEWS_URL_PATTERNS[rng.randint(15)]
            urls.append(f"https://www.{host}/{i}")
        elif rng.rand() < 0.1:
            urls.append(None)
        else:
            urls.append(f"https://law.example.org/cases/{i}")
        texts.append(text)

    return pd.DataFrame(
        {
            "id": pd.array(ids, dtype="string"),
            "text": pd.array(texts, dtype="string"),
            "url": pd.array(urls, dtype="string"),
        }
    )
