"""Conversation-level keep/drop roll-up over the per-turn verdict frame.

The pipeline (pipeline.run_pipeline) decides keep/drop per TURN — the
reference's granularity (its pandas filter scores one document at a
time). Training-data curation for dialog models usually wants the
decision one level up: drop the WHOLE conversation when too few of its
turns survive (a mostly-garbage conversation's surviving turns lack
coherent context) or when any turn tripped a fatal reason (e.g. PII
that scrubbing can't certify, or a dedup hit that marks the whole
conversation a retry twin — see prefixdedup).

Scale shape: one map-side-combining groupBy(conv_id) over four boolean/
count aggregates — the exchange carries one slim row per conversation,
never text. `filter_conversations` joins the (conv_id, conv_keep)
decision frame back; at 10^12 turns that's the same storage-partitioned
/ bucketed-join shape as every per-conversation op in this repo
(sources/bucketed.py), and the decision frame is ~1/turns_per_conv the
size of the corpus.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def conversation_verdicts(
    verdicts: DataFrame,
    min_keep_frac: float = 0.5,
    fatal_reasons: Sequence[str] = (),
) -> DataFrame:
    """(conv_id, turns, kept_turns, keep_frac, fatal_turns, conv_keep):
    ``conv_keep`` = keep_frac >= min_keep_frac AND zero turns whose
    reject_reason is in ``fatal_reasons``. NULL reject_reason (kept
    turns) never counts as fatal; an empty ``fatal_reasons`` disables
    the fatal rule."""
    if not 0.0 <= min_keep_frac <= 1.0:
        raise ValueError(f"min_keep_frac {min_keep_frac} outside [0, 1]")
    fatal = (
        F.col("reject_reason").isin(list(fatal_reasons))
        if fatal_reasons
        else F.lit(False)
    )
    return (
        verdicts.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("turns"),
            F.sum(F.col("keep").cast("long")).alias("kept_turns"),
            # coalesce inside the sum: isin() is NULL for NULL
            # reject_reason (kept turns), and a sum over all-NULL inputs
            # returns NULL, not 0 — a fully-kept conversation must count
            # zero fatal turns
            F.sum(F.coalesce(fatal.cast("long"), F.lit(0))).alias(
                "fatal_turns"
            ),
        )
        .withColumn(
            "keep_frac", F.round(F.col("kept_turns") / F.col("turns"), 6)
        )
        .withColumn(
            "conv_keep",
            # direct double comparison, NOT ceil(frac*turns): IEEE
            # round-to-nearest makes kept/turns and the frac literal agree
            # at representable boundaries (1/10 == lit(0.1)), whereas
            # ceil(0.1*10) is ceil(1.0000000000000002) = 2
            (F.col("kept_turns") / F.col("turns") >= F.lit(float(min_keep_frac)))
            & (F.col("fatal_turns") == 0),
        )
        .select(
            "conv_id", "turns", "kept_turns", "keep_frac", "fatal_turns",
            "conv_keep",
        )
    )


def filter_conversations(
    verdicts: DataFrame,
    min_keep_frac: float = 0.5,
    fatal_reasons: Sequence[str] = (),
    kept_turns_only: bool = True,
) -> DataFrame:
    """The verdict rows of conversations that pass
    `conversation_verdicts` — by default only their kept turns (the
    shippable corpus); ``kept_turns_only=False`` keeps the rejected
    rows too (for auditing a released conversation's gaps)."""
    decisions = conversation_verdicts(
        verdicts, min_keep_frac=min_keep_frac, fatal_reasons=fatal_reasons
    ).filter("conv_keep")
    out = verdicts.join(decisions.select("conv_id"), "conv_id", "left_semi")
    return out.filter("keep") if kept_turns_only else out
