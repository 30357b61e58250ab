"""Transcript repairs: role-run coalescing and token-budget truncation.

Two SFT-preprocessing transforms every trainer applies between raw
transcripts and a tokenizer, both pure JVM window/aggregate plans (zero
Python in the hot path):

- ``coerce_roles``: chat templates require strictly alternating roles;
  raw agent logs routinely emit consecutive same-role turns (multi-part
  assistant answers, repeated tool results). Merge each maximal run of
  consecutive same-role turns into ONE turn (texts joined by newline,
  original order), renumbering turn_idx densely. Null roles compare via
  null-safe equality (two consecutive null-role turns merge).

- ``truncate_conversation_tokens``: context windows are finite; keep the
  longest PREFIX of turns whose cumulative estimated tokens fits the
  budget (the turn-sequence analog of word_boundary_truncate — never
  split a turn mid-text). Token estimate is the repo-wide F16 convention
  max(1, len(text)//4) (packing.py uses the same). A first turn that
  alone exceeds the budget drops the whole conversation — a conversation
  whose opening cannot fit is unusable, matching the packing kernel's
  oversize-singleton philosophy inverted for prefixes.

No reference analog — transcript-corpus ops (the reference is a
single-document pipeline). Scale shape: one window partitioned by
conv_id each — a single hash exchange on the conversation key, the same
partitioning the pipeline's conv_stats stage already uses, so at 10^12
turns these chain onto existing conv-partitioned stages with no extra
shuffle. The coalesce's ordered text join is collect_list(struct) +
array_sort + array_join — bounded by run length (a run is a few turns;
a pathological single-role conversation degrades to one row holding that
conversation's text, the documented giant-group trade shared with
packing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def coerce_roles(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Merge consecutive same-role turns; returns (conv_id, new_idx, role,
    text, n_merged) with new_idx dense from 0."""
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    flagged = df.select(
        F.col(conv_col).alias("conv_id"),
        F.col(turn_col).cast("int").alias("turn_idx"),
        F.col(role_col).alias("role"),
        F.coalesce(F.col(text_col), F.lit("")).alias("text"),
    ).withColumn(
        "_run",
        # a run starts at the conversation's first row (lag over the
        # non-null turn_idx is NULL exactly there — role itself may
        # legitimately be NULL) or wherever the role changes null-safely
        F.sum(
            F.when(F.lag("turn_idx").over(w).isNull(), F.lit(1))
            .otherwise(
                (~F.col("role").eqNullSafe(F.lag("role").over(w))).cast("int")
            )
        ).over(w),
    )
    return (
        flagged.groupBy("conv_id", "_run")
        .agg(
            F.min("role").alias("role"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                    lambda x: x["text"],
                ),
                "\n",
            ).alias("text"),
            F.count(F.lit(1)).cast("int").alias("n_merged"),
        )
        .select(
            "conv_id",
            (F.col("_run") - 1).cast("int").alias("new_idx"),
            "role",
            "text",
            "n_merged",
        )
    )


def repair_protocol(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Drop protocol-violating turns so transcripts satisfy the structure
    checks (validation.transcript_structure_checks) — the repair
    counterpart to validation:

    1. unknown/null roles are dropped;
    2. leading turns before the first 'system' or 'user' turn are dropped
       (a conversation cannot open with an answer or a tool result);
    3. a maximal run of consecutive 'tool' turns is kept only when the
       run immediately follows an 'assistant' turn (tool results answer
       tool CALLS); since two tool runs are never adjacent (maximality),
       dropping one cannot invalidate another — the rules are one-pass,
       no cascade, hence window-expressible in both engines;
    4. survivors are renumbered densely (new_idx), original turn_idx
       kept as provenance.

    Pure JVM window plan on the conv_id partitioning."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    wc = Window.partitionBy("conv_id")
    t = df.select(
        F.col(conv_col).alias("conv_id"),
        F.col(turn_col).cast("int").alias("turn_idx"),
        F.col(role_col).alias("role"),
        F.col(text_col).alias("text"),
    ).filter(F.col("role").isin("system", "user", "assistant", "tool"))
    t = t.withColumn(
        "_anchor",
        F.min(
            F.when(F.col("role").isin("system", "user"), F.col("turn_idx"))
        ).over(wc),
    ).filter(F.col("turn_idx") >= F.col("_anchor"))
    t = t.withColumn(
        "_flag",
        F.when(F.lag("turn_idx").over(w).isNull(), F.lit(1)).otherwise(
            (F.col("role") != F.lag("role").over(w)).cast("int")
        ),
    ).withColumn("_run", F.sum("_flag").over(w))
    prev_run_role = F.max(
        F.when(F.col("_flag") == 1, F.lag("role").over(w))
    ).over(Window.partitionBy("conv_id", "_run"))
    t = t.withColumn("_prev_run_role", prev_run_role).filter(
        (F.col("role") != F.lit("tool"))
        | (F.col("_prev_run_role") == F.lit("assistant"))
    )
    return t.select(
        "conv_id",
        (
            F.row_number().over(
                Window.partitionBy("conv_id").orderBy("turn_idx")
            )
            - 1
        ).alias("new_idx"),
        "role",
        "text",
        F.col("turn_idx").alias("orig_idx"),
    )


def truncate_conversation_tokens(
    df: DataFrame,
    budget: int,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Longest prefix of each conversation's turns with cumulative
    estimated tokens <= budget; returns the kept turns plus their running
    total (conv_id, turn_idx, role, text, cum_tok)."""
    w = (
        Window.partitionBy(conv_col)
        .orderBy(F.col(turn_col).cast("int"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tok = F.greatest(
        F.lit(1), F.floor(F.length(F.coalesce(F.col(text_col), F.lit(""))) / 4)
    ).cast("long")
    return (
        df.withColumn("_cum", F.sum(tok).over(w))
        .filter(F.col("_cum") <= budget)
        .select(
            F.col(conv_col).alias("conv_id"),
            F.col(turn_col).cast("int").alias("turn_idx"),
            F.col("role").alias("role"),
            F.col(text_col).alias("text"),
            F.col("_cum").alias("cum_tok"),
        )
    )


def drop_retry_duplicates(df: DataFrame, renumber: bool = True) -> DataFrame:
    """Drop consecutive turns that repeat the SAME role AND the SAME text
    — the retry artifact (client resends, model regenerations committed
    twice) that role-coalescing would otherwise concatenate into
    'answer\\nanswer'. Run this BEFORE coerce_roles for that reason.

    Keeps the FIRST turn of each identical run; comparison is null-safe
    on both role and text (two consecutive NULL-text same-role turns are
    a retry pair too). One conversation window (same conv_id exchange as
    every repair), optional dense renumber preserving original order.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    dup = F.col("role").eqNullSafe(F.lag("role").over(w)) & F.col(
        "text"
    ).eqNullSafe(F.lag("text").over(w))
    out = df.withColumn("_dup", dup).filter(~F.col("_dup")).drop("_dup")
    if renumber:
        out = out.withColumn(
            "turn_idx", (F.row_number().over(w) - 1).cast("int")
        )
    return out


def split_episodes(df: DataFrame, gap_s: int = 3600) -> DataFrame:
    """Label every turn with `episode_idx`: a new episode starts when the
    gap from the last TIMESTAMPED turn in the conversation exceeds
    `gap_s` seconds (long-running agent sessions resume hours later; SFT
    context and chunking should not cross that boundary — run this before
    sft_pairs / chunk_text and group on (conv_id, episode_idx)).

    NULL-ts turns never start an episode and never reset the gap clock:
    the comparison baseline is last(ts IGNORE NULLS) over the preceding
    frame, so a burst of untimestamped tool turns inherits the episode
    and a later timestamped turn still measures from the last real
    timestamp. One conversation window, running-sum labeling — the same
    conv_id exchange as every repair."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    cur = F.unix_timestamp("ts")
    prev_known = F.last(cur, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flag = F.when(
        prev_known.isNotNull() & cur.isNotNull() & (cur - prev_known > gap_s),
        1,
    ).otherwise(0)
    return df.withColumn(
        "episode_idx",
        F.sum(flag).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"),
    )
