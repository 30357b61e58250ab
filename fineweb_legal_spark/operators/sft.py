"""SFT training-pair extraction from multi-turn transcripts: for every
target-role turn, assemble the preceding context window as one prompt
string — the step that turns a FILTERED transcript corpus into
(context, target) rows a fine-tuning loader consumes.

Window-only implementation: `lag(line, i)` for i = k..1 over
(conv_id, turn_idx), concat_ws-joined (concat_ws skips NULLs, so
conversations shorter than the window need no special casing) — zero
UDFs, zero extra shuffles beyond the one conv_id hash exchange every
per-conversation op in this repo already pays, and the window frame is
O(k) per row regardless of conversation length. The k-lag form is chosen
over collect_list(unbounded-preceding) deliberately: an unbounded frame
materializes O(turns²) strings on a 10⁸-turn conversation, while k lags
are flat. Token-budget trimming of the CONTEXT is left to the chunking /
truncation ops (textql.chunk_text, repairs.truncate_turns) upstream;
composing them keeps each op one-shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sft_pairs(
    df: DataFrame,
    context_turns: int = 8,
    target_role: str = "assistant",
    sep: str = "\n",
) -> DataFrame:
    """(conv_id, turn_idx, n_context, context, target) for every
    `target_role` turn: `context` is up to `context_turns` preceding
    turns rendered as 'role: text' lines (oldest first), `target` the
    turn's own text. Turns with NULL text render as 'role: ' lines,
    preserving position; a target turn with no preceding turns yields an
    empty context (kept — the caller decides whether zero-context pairs
    train)."""
    if context_turns < 1:
        raise ValueError("context_turns must be >= 1")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    line = F.concat(
        F.coalesce("role", F.lit("")),
        F.lit(": "),
        F.coalesce("text", F.lit("")),
    )
    lags = [F.lag(line, i).over(w) for i in range(context_turns, 0, -1)]
    n_ctx = sum(
        (lag.isNotNull().cast("int") for lag in lags), F.lit(0)
    )
    return (
        df.withColumn("context", F.concat_ws(sep, *lags))
        .withColumn("n_context", n_ctx)
        .filter(F.col("role") == target_role)
        .select(
            "conv_id",
            "turn_idx",
            "n_context",
            "context",
            F.col("text").alias("target"),
        )
    )
