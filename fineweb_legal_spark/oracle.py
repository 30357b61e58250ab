"""Single-node pandas oracle — the golden-label source (SURVEY.md §5).

Implements the exact north_rule semantics once, sequentially, with no Spark:
heuristic rules (textstats), language-ID + perplexity (artifacts), PII scrub
(scrub), dedup with deterministic "first" = min(conv_id, turn_idx).

pytest asserts the Spark pipeline reproduces this frame exactly
(keep/drop F1 == 1.0, byte-equal scrubbed text under (conv_id, turn_idx)
ordering).
"""

from __future__ import annotations

import pandas as pd

from . import spec, textstats
from .artifacts import get_artifacts
from .scrub import scrub_text


def _heuristic_reason(text: str | None, conv_mean_words: float) -> str | None:
    if text is None or not (spec.MIN_TURN_CHARS <= len(text) <= spec.MAX_TURN_CHARS):
        return "length"
    if conv_mean_words < spec.MIN_CONV_MEAN_WORDS:
        return "conv_stats"
    wc = textstats.word_count(text)
    mwl = textstats.mean_word_len(text)
    if (
        wc < spec.MIN_TURN_WORDS
        or wc > spec.MAX_TURN_WORDS
        or mwl is None
        or not (spec.MIN_MEAN_WORD_LEN <= mwl <= spec.MAX_MEAN_WORD_LEN)
    ):
        return "word_stats"
    if wc >= spec.STOPWORD_MIN_WORDS:
        if textstats.stopword_count(text) / wc < spec.MIN_STOPWORD_RATIO:
            return "stopword_ratio"
    lines = textstats.nonempty_lines(text)
    if len(lines) >= spec.REPETITION_MIN_LINES:
        if (1.0 - len(set(lines)) / len(lines)) > spec.MAX_DUP_LINE_FRACTION:
            return "repetition"
    if wc >= spec.REPETITION_MIN_WORDS:
        dwr = textstats.distinct_word_ratio(text)
        if dwr is not None and dwr < spec.MIN_DISTINCT_WORD_RATIO:
            return "repetition"
    if textstats.symbol_count(text) / len(text) > spec.MAX_SYMBOL_RATIO:
        return "symbol_ratio"
    return None


def oracle_verdicts(transcripts: pd.DataFrame) -> pd.DataFrame:
    """golden_verdicts frame: one row per input turn (FIXTURES.md §2)."""
    df = transcripts.copy()
    arts = get_artifacts()

    texts = df["text"]
    wc_all = texts.map(lambda t: 0 if t is None or t is pd.NA else textstats.word_count(t))
    conv_mean = wc_all.groupby(df["conv_id"]).transform("mean")

    n = len(df)
    reasons: list[str | None] = [None] * n
    langs: list[str | None] = [None] * n
    buckets: list[int | None] = [None] * n
    norm_keys: list[str | None] = [None] * n
    clean_texts: list[str | None] = []
    for i, (text, cm) in enumerate(zip(texts, conv_mean)):
        t = None if text is None or text is pd.NA else str(text)
        clean_texts.append(t)
        reasons[i] = _heuristic_reason(t, float(cm))

    # model stage (heuristic survivors only) — uses the SAME batch kernels
    # as the Spark pandas UDF so float accumulation order is shared
    surv_idx = [i for i, r in enumerate(reasons) if r is None]
    surv_texts = [clean_texts[i] for i in surv_idx]
    if surv_idx:
        pl = arts.predict_lang_batch(surv_texts)
        pp = arts.perplexity_batch(surv_texts)
        for j, i in enumerate(surv_idx):
            langs[i] = pl[j]
            buckets[i] = arts.ppl_bucket(float(pp[j]))
            if pl[j] != spec.LANGID_KEEP_LANG:
                reasons[i] = "lang"
            elif pp[j] > spec.PPL_MAX:
                reasons[i] = "perplexity"
            else:
                norm_keys[i] = textstats.norm_hash(surv_texts[j])

    out = pd.DataFrame(
        {
            "conv_id": df["conv_id"].astype(str),
            "turn_idx": df["turn_idx"].astype("int32"),
            "reject_reason": pd.array(reasons, dtype="string"),
            "lang": pd.array(langs, dtype="string"),
            "ppl_bucket": pd.array(buckets, dtype="Int32"),
            "_norm": pd.array(norm_keys, dtype="string"),
            "_text": texts,
        }
    )

    # dedup among survivors: winner = min (conv_id, turn_idx) per norm hash
    surv = out[out["reject_reason"].isna() & out["_norm"].notna()]
    ranked = surv.sort_values(["_norm", "conv_id", "turn_idx"], kind="mergesort")
    losers = ranked.duplicated(subset=["_norm"], keep="first")
    loser_idx = ranked.index[losers]
    out.loc[loser_idx, "reject_reason"] = "duplicate"

    out["keep"] = out["reject_reason"].isna()
    out["scrubbed_text"] = pd.array(
        [
            scrub_text(None if t is pd.NA or t is None else str(t)) if k else None
            for t, k in zip(out["_text"], out["keep"])
        ],
        dtype="string",
    )
    out = out.drop(columns=["_norm", "_text"])
    out = out[
        ["conv_id", "turn_idx", "keep", "reject_reason", "scrubbed_text", "lang", "ppl_bucket"]
    ]
    return out.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)


def oracle_web_keep(webdocs: pd.DataFrame) -> pd.DataFrame:
    """Reference stage-1 filter oracle on (id, text, url) — SURVEY §2.2 F1-F6.

    Independent re-implementation of the semantics of
    scripts/stream_filter_stage1.py:149-224 (not copied code): length ->
    news-URL -> boilerplate (first/last 1000 chars, tail only when
    len > window) -> unique-keyword count >= 2 in first 5000 -> >=1 citation
    regex in first 8000.
    """
    import re as _re

    cite_res = [
        _re.compile(p if cs else "(?i)" + p) for p, cs in spec.CITATION_PATTERNS
    ]

    def reason(text: str | None, url: str | None) -> str | None:
        t = "" if text is None else text
        if not (spec.WEB_MIN_CHARS <= len(t) <= spec.WEB_MAX_CHARS):
            return "length"
        u = ("" if url is None else url).lower()
        if any(p in u for p in spec.NEWS_URL_PATTERNS):
            return "news_url"
        head = t[: spec.WEB_BOILER_WINDOW].lower()
        tail = t[-spec.WEB_BOILER_WINDOW :].lower() if len(t) > spec.WEB_BOILER_WINDOW else ""
        if any(b in head or (tail and b in tail) for b in spec.BOILERPLATE_PHRASES):
            return "boilerplate"
        kw_window = t[: spec.WEB_KEYWORD_WINDOW].lower()
        hits = sum(1 for k in spec.QUALITY_KEYWORDS if k in kw_window)
        if hits < spec.WEB_MIN_KEYWORDS:
            return "keywords"
        cite_window = t[: spec.WEB_CITATION_WINDOW]
        if not any(r.search(cite_window) for r in cite_res):
            return "citation"
        return None

    reasons = [
        reason(
            None if t is pd.NA or t is None else str(t),
            None if u is pd.NA or u is None else str(u),
        )
        for t, u in zip(webdocs["text"], webdocs["url"])
    ]
    out = webdocs[["id"]].copy()
    out["reject_reason"] = pd.array(reasons, dtype="string")
    out["keep"] = out["reject_reason"].isna()
    return out
