"""Preference-pair extraction: (context, chosen, rejected) rows for
DPO/RLHF-style training from groups of scored candidate responses — the
step after quality scoring that turns "several candidate answers to the
same prompt" into contrastive pairs a preference trainer consumes.

Grouping is the caller's contract: ``group_col`` identifies candidates
that answer the SAME prompt (e.g. ``md5(context)`` over
``sft.sft_pairs`` output, a sampling run id, or an explicit prompt id).
Within each group the chosen response is the deterministic argmax —
highest ``score_col``, ties broken by lowest ``id_col`` — and pairs are
emitted against either every other candidate (``best_vs_rest``) or only
the deterministic argmin (``best_vs_worst``, one pair per group).

Scale shape: ONE hash exchange on ``group_col``; both window orderings
(forward for the argmax, reverse for the argmin) sort the same
partitioning, so Catalyst reuses the exchange. No self-join and no
all-pairs blowup — ``best_vs_rest`` is O(g) output rows per group of g
candidates, never O(g²). Candidate text rides the group exchange once
(candidate sets per prompt are small — typically 2-16 sampled
responses); for pathological groups the upstream sampler, not this
operator, bounds g. Rows with a NULL score cannot be ordered and are
dropped from both roles (documented; count them upstream with the
filter-audit suite if the loss matters).

No reference analog: the reference pipeline (single-node pandas filter,
docs/TECHNICAL_REPORT.md) scores documents but never builds contrastive
pairs; this extends the training-data toolkit the same way sft.py does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MODES = ("best_vs_rest", "best_vs_worst")


def preference_pairs(
    df: DataFrame,
    group_col: str = "group_key",
    id_col: str = "cand_id",
    text_col: str = "text",
    score_col: str = "score",
    mode: str = "best_vs_rest",
    min_margin: float = 0.0,
) -> DataFrame:
    """(group_key, chosen_id, chosen, chosen_score, rejected_id,
    rejected, rejected_score, margin) — one row per emitted pair.

    ``min_margin`` keeps only pairs with ``chosen_score - rejected_score
    >= min_margin``; at the default 0.0 a tie with the chosen response
    still forms a pair (the id tie-break decides who is "chosen"), so
    pass a positive margin to require a strict quality gap. Groups with
    a single scored candidate emit nothing.
    """
    if mode not in MODES:
        raise ValueError(f"mode {mode!r} not in {MODES}")
    scored = df.filter(F.col(score_col).isNotNull())
    fwd = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    base = (
        scored.withColumn("_c_id", F.first(id_col).over(fwd))
        .withColumn("_c_text", F.first(text_col).over(fwd))
        .withColumn("_c_score", F.first(score_col).over(fwd))
    )
    if mode == "best_vs_worst":
        rev = Window.partitionBy(group_col).orderBy(
            F.col(score_col).asc(), F.col(id_col).desc()
        )
        base = base.withColumn("_rn_rev", F.row_number().over(rev)).filter(
            F.col("_rn_rev") == 1
        )
    return (
        base.filter(F.col(id_col) != F.col("_c_id"))
        .filter(F.col("_c_score") - F.col(score_col) >= F.lit(float(min_margin)))
        .select(
            F.col(group_col).alias("group_key"),
            F.col("_c_id").alias("chosen_id"),
            F.col("_c_text").alias("chosen"),
            F.col("_c_score").alias("chosen_score"),
            F.col(id_col).alias("rejected_id"),
            F.col(text_col).alias("rejected"),
            F.col(score_col).alias("rejected_score"),
            (F.col("_c_score") - F.col(score_col)).alias("margin"),
        )
    )
