"""Agent-transcript analytics over the (conv_id, turn_idx, role, text,
tool, ts) schema: what an agent-platform team asks of its transcript
corpus before and after filtering — which tools run, how often they
fail, how long they take, and how tool-heavy conversations are.

Shapes: `tool_usage_stats` is one conversation window (lag ts — the same
conv_id hash exchange every per-conversation op here pays) feeding one
groupBy(tool) whose exchange carries a row per tool per partition;
`conversation_tool_profile` is a single groupBy(conv_id) of boolean/count
aggregates. No text ever moves: the error signal is evaluated at the
scan and only its boolean rides the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# conservative failure markers for tool-output turns; a lexicon, not a
# parser — callers with structured tool results should pass their own
TOOL_ERROR_RX = r"(?i)\b(error|exception|traceback|failed|timeout)\b"


def _is_tool(col: Column | None = None) -> Column:
    return (col if col is not None else F.col("role")) == "tool"


def tool_usage_stats(
    df: DataFrame, error_rx: str = TOOL_ERROR_RX
) -> DataFrame:
    """Per-tool: calls, conversations, error_frac (text matching
    `error_rx`), and latency stats in seconds (ts of the tool turn minus
    ts of the immediately preceding turn — the request it answers;
    NULL-ts pairs drop out of the latency aggregates only)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    # double-cast via TIMESTAMP: a TIMESTAMP_NTZ column (what parquet
    # round-trips) cannot cast straight to DOUBLE under ANSI; the
    # intermediate cast is the identity under the engine's pinned UTC
    # session timezone and keeps fractional seconds
    epoch = F.col("ts").cast("timestamp").cast("double")
    lat = epoch - F.lag(epoch).over(w)
    tools = (
        df.withColumn("_lat", lat)
        .filter(_is_tool() & F.col("tool").isNotNull())
        .select(
            "tool",
            "conv_id",
            "_lat",
            F.coalesce(F.col("text").rlike(error_rx), F.lit(False)).alias(
                "_err"
            ),
        )
    )
    return (
        tools.groupBy("tool")
        .agg(
            F.count(F.lit(1)).alias("calls"),
            F.countDistinct("conv_id").alias("conversations"),
            F.round(F.avg(F.col("_err").cast("double")), 6).alias(
                "error_frac"
            ),
            F.round(F.avg("_lat"), 3).alias("mean_latency_s"),
            F.round(F.max("_lat"), 3).alias("max_latency_s"),
        )
        .orderBy("tool")
    )


def conversation_tool_profile(df: DataFrame) -> DataFrame:
    """Per-conversation: turns, tool calls, distinct tools, tool_frac —
    the 'how agentic is this corpus' distribution input."""
    is_tool = _is_tool().cast("long")
    return df.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("turns"),
        F.sum(is_tool).alias("tool_calls"),
        F.countDistinct(F.when(_is_tool(), F.col("tool"))).alias(
            "distinct_tools"
        ),
        F.round(F.sum(is_tool) / F.count(F.lit(1)), 6).alias("tool_frac"),
    )


def lang_consistency(df: DataFrame, lang_col: str = "lang") -> DataFrame:
    """Per-conversation language profile over a turn frame carrying a
    language column (e.g. pipeline verdicts): majority_lang (ties broken
    lexicographically — deterministic across engines), lang_turns (turns
    with a non-NULL language), majority_frac of those, and n_langs. The
    mixed-language-conversation filter is then a one-line predicate on
    majority_frac / n_langs.

    Shape: groupBy(conv_id, lang) count (map-side combining, slim
    exchange) → max(struct) pick of the majority (no second window
    shuffle: the (count, lang) struct max and the distinct-lang count
    ride ONE groupBy(conv_id) over the tiny per-(conv, lang) frame)."""
    per_lang = (
        df.filter(F.col(lang_col).isNotNull())
        .groupBy("conv_id", F.col(lang_col).alias("_lang"))
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    # majority = min over (-count, lang): largest count wins, ties pick
    # the lexicographically smallest language — deterministic across
    # engines with no string tricks
    pick = F.min(
        F.struct((-F.col("_n")).alias("neg_n"), F.col("_lang").alias("lang"))
    )
    return per_lang.groupBy("conv_id").agg(
        pick.getField("lang").alias("majority_lang"),
        F.sum("_n").alias("lang_turns"),
        F.round(-pick.getField("neg_n") / F.sum("_n"), 6).alias(
            "majority_frac"
        ),
        F.count(F.lit(1)).alias("n_langs"),
    )
