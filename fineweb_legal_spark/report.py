"""Corpus data card: one JSON-able health snapshot of a pipeline run —
what a training-data team publishes next to the dataset (reference
parity: the per-run counters in streaming.py's metrics plus the
describe()-style stats in stats.py, consolidated into one artifact).

Scale shape: the verdict frame is scanned THREE times — one wide
aggregate for every fixed-domain counter and numeric total (kept/reject
attribution via boolean sums, token estimates, text-length moments; the
exchange is a single partial-sum row per partition), plus two tiny-key
groupBys (lang mix, ppl histogram) whose exchanges carry at most
|distinct key| rows per partition. At 10^12 turns you run this over the
WRITTEN output table (one job, three column-pruned scans of two columns
each), not over a recomputed pipeline; `jobs/run_report.py` does exactly
that when given --input.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the pipeline's full first-trip attribution vocabulary (pipeline.py
# heuristic_reason_col + model stage + dedup window)
REJECT_REASONS = (
    "length",
    "conv_stats",
    "word_stats",
    "stopword_ratio",
    "repetition",
    "symbol_ratio",
    "lang",
    "perplexity",
    "duplicate",
)


def corpus_report(verdicts: DataFrame) -> dict:
    """Collect the data card for a verdict frame
    (conv_id, turn_idx, keep, reject_reason, scrubbed_text, lang,
    ppl_bucket). Returns a plain JSON-able dict.

    Also accepts a RELEASED corpus (the lineage-committed output of
    ``jobs/run_filter.py``, kept rows only, no keep/reject_reason
    columns): every row counts as kept, reject attribution is empty, and
    the card carries ``verdicts_present: false`` so a dashboard can't
    mistake "no verdict columns" for "zero rejects". For the full
    attribution card, run over the verdict frame
    (``run_filter.py --verdicts-out``)."""
    verdicts_present = "keep" in verdicts.columns
    if not verdicts_present:
        verdicts = verdicts.withColumn("keep", F.lit(True)).withColumn(
            "reject_reason", F.lit(None).cast("string")
        )
    kept_len = F.when(F.col("keep"), F.length("scrubbed_text"))
    wide = verdicts.agg(
        F.count(F.lit(1)).alias("turns"),
        F.approx_count_distinct("conv_id").alias("conversations_approx"),
        F.sum(F.col("keep").cast("long")).alias("kept_turns"),
        *[
            # coalesce the NULL-comparison inside the sum: an all-NULL
            # reject_reason column (fully-kept / released corpus) must
            # sum to 0, not NULL — sum() skips NULLs and returns NULL
            # when every input was NULL
            F.sum(
                F.coalesce((F.col("reject_reason") == r).cast("long"), F.lit(0))
            ).alias(f"r_{r}")
            for r in REJECT_REASONS
        ],
        F.sum(F.coalesce(kept_len, F.lit(0))).alias("kept_chars"),
        # NOTE: greatest() skips NULLs in Spark, so the kept-guard must be
        # OUTSIDE it — greatest(1, NULL) is 1, not NULL
        F.sum(
            F.when(
                F.col("keep"), F.greatest(F.lit(1), F.floor(kept_len / 4))
            ).otherwise(0)
        )
        .cast("long")
        .alias("kept_tok_est"),
        F.round(F.avg(kept_len), 2).alias("kept_mean_chars"),
    ).collect()[0]
    langs = {
        r["lang"]: r["n"]
        for r in verdicts.filter(F.col("lang").isNotNull())
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    ppl = {
        int(r["ppl_bucket"]): r["n"]
        for r in verdicts.filter(F.col("ppl_bucket").isNotNull())
        .groupBy("ppl_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    turns = wide["turns"]
    rejects = {r: wide[f"r_{r}"] for r in REJECT_REASONS}
    return {
        "verdicts_present": verdicts_present,
        "turns": turns,
        "conversations_approx": wide["conversations_approx"],
        "kept_turns": wide["kept_turns"],
        "kept_frac": round(wide["kept_turns"] / turns, 6) if turns else None,
        "rejects": {k: v for k, v in rejects.items() if v},
        "reject_other": turns
        - wide["kept_turns"]
        - sum(rejects.values()),
        "kept_chars": wide["kept_chars"],
        "kept_tok_est": wide["kept_tok_est"],
        "kept_mean_chars": (
            float(wide["kept_mean_chars"])
            if wide["kept_mean_chars"] is not None
            else None
        ),
        "lang_mix": dict(sorted(langs.items())),
        "ppl_histogram": dict(sorted(ppl.items())),
    }


def merge_cards(cards: list[dict]) -> dict:
    """Fold per-shard data cards into one corpus card WITHOUT rescanning
    — the 10^12-turn pattern: each daily/bucketed run publishes its own
    card (one slim job over its own output), and the corpus-level card
    is this pure-Python counter merge.

    Every field is an exact monoid except ``conversations_approx``:
    HLL sketches aren't retained in the card, so the merge SUMS the
    shard values — exact iff shards never split a conversation (true
    for this repo's conv_id-bucketed layouts), an overcount otherwise;
    the merged card says so in ``conversations_merge``. Means/fractions
    are re-derived from the merged sums, never averaged."""
    if not cards:
        raise ValueError("merge_cards needs at least one card")

    def _sum(key: str) -> int:
        return sum(c[key] for c in cards)

    def _merge_counts(key: str) -> dict:
        out: dict = {}
        for c in cards:
            for k, v in c[key].items():
                out[k] = out.get(k, 0) + v
        return dict(sorted(out.items()))

    turns = _sum("turns")
    kept_turns = _sum("kept_turns")
    kept_chars = _sum("kept_chars")
    return {
        "verdicts_present": all(c["verdicts_present"] for c in cards),
        "turns": turns,
        "conversations_approx": _sum("conversations_approx"),
        "conversations_merge": "sum (exact iff shards are conv-disjoint)",
        "kept_turns": kept_turns,
        "kept_frac": round(kept_turns / turns, 6) if turns else None,
        "rejects": _merge_counts("rejects"),
        "reject_other": _sum("reject_other"),
        "kept_chars": kept_chars,
        "kept_tok_est": _sum("kept_tok_est"),
        "kept_mean_chars": (
            round(kept_chars / kept_turns, 2) if kept_turns else None
        ),
        "lang_mix": _merge_counts("lang_mix"),
        "ppl_histogram": _merge_counts("ppl_histogram"),
    }


def _shares(counts: dict) -> dict:
    total = sum(counts.values())
    return {k: v / total for k, v in counts.items()} if total else {}


def _js_divergence(p: dict, q: dict) -> float:
    """Jensen-Shannon divergence (base-2, in [0, 1]) between two count
    histograms — symmetric and finite even when supports differ."""
    ps, qs = _shares(p), _shares(q)
    if not ps or not qs:
        return 1.0 if ps or qs else 0.0
    keys = set(ps) | set(qs)
    js = 0.0
    for k in keys:
        a, b = ps.get(k, 0.0), qs.get(k, 0.0)
        m = (a + b) / 2
        if a:
            js += a * math.log2(a / m) / 2
        if b:
            js += b * math.log2(b / m) / 2
    return js


def diff_cards(
    old: dict,
    new: dict,
    max_kept_frac_drift: float = 0.05,
    max_lang_share_drift: float = 0.05,
    max_ppl_js: float = 0.1,
) -> dict:
    """Distribution-level release gate between two data cards — the
    card-shaped complement of operators/diff.corpus_diff (row-level).
    Catches what a row diff can't see cheaply: the NEW crawl slice that
    shifts the language mix, a scorer change that moves the perplexity
    histogram, a filter regression that silently drops the kept
    fraction. Pure Python over two published cards: no Spark job, no
    rescan.

    Returns per-signal drift values plus an overall ``ok``; thresholds
    are keyword-tunable and recorded in the result so the gate's
    configuration ships with its verdict."""
    kept_drift = abs(
        (new.get("kept_frac") or 0.0) - (old.get("kept_frac") or 0.0)
    )
    lang_old, lang_new = (
        _shares(old.get("lang_mix", {})),
        _shares(new.get("lang_mix", {})),
    )
    lang_drifts = {
        k: round(abs(lang_new.get(k, 0.0) - lang_old.get(k, 0.0)), 6)
        for k in sorted(set(lang_old) | set(lang_new))
    }
    max_lang = max(lang_drifts.values(), default=0.0)
    ppl_js = _js_divergence(
        old.get("ppl_histogram", {}), new.get("ppl_histogram", {})
    )
    reject_old, reject_new = (
        _shares(old.get("rejects", {})),
        _shares(new.get("rejects", {})),
    )
    reject_drifts = {
        k: round(abs(reject_new.get(k, 0.0) - reject_old.get(k, 0.0)), 6)
        for k in sorted(set(reject_old) | set(reject_new))
    }
    ok = (
        kept_drift <= max_kept_frac_drift
        and max_lang <= max_lang_share_drift
        and ppl_js <= max_ppl_js
    )
    return {
        "ok": ok,
        "turns_old": old.get("turns"),
        "turns_new": new.get("turns"),
        "kept_frac_drift": round(kept_drift, 6),
        "lang_share_drifts": lang_drifts,
        "max_lang_share_drift": round(max_lang, 6),
        "reject_share_drifts": reject_drifts,
        "ppl_js_divergence": round(ppl_js, 6),
        "thresholds": {
            "max_kept_frac_drift": max_kept_frac_drift,
            "max_lang_share_drift": max_lang_share_drift,
            "max_ppl_js": max_ppl_js,
        },
    }
