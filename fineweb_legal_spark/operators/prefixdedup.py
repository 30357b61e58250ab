"""Conversation prefix dedup: drop transcripts that are exact prefixes of
longer transcripts.

Agent/SFT corpora are full of retried and resumed runs: the same
conversation re-executed past a crash, a branch re-rolled from turn k, a
truncated export next to its complete twin. Document-level dedup misses
these (the longer run is not a near-duplicate of its own prefix once it
grows enough new turns), and turn-level dedup can't drop them (each turn
is legitimately shared). The right unit is the ordered turn SEQUENCE:
conversation A is redundant when its entire normalized turn sequence is a
prefix of conversation B's — training on A adds no token not already in
B. No reference analog — a transcript-corpus hygiene op (the transcript
analog of the reference's document-level exact dedup,
consolidate_and_clean.py:64-99, lifted from bags of text to ordered
sequences).

Semantics: per-turn key = md5(lower(trim(text))) over non-null-text turns
ordered by turn_idx; prefix digest at length m = md5 of the first m keys
joined by '|'. Conversation A (length la >= min_turns) loses iff some
B != A has prefix_digest(la) == A's full digest and (len(B) > len(A), or
equal lengths and B.conv_id < A.conv_id — so one canonical member of an
identical group survives). Output: one row per loser with its canonical
winner (the longest such B, conv_id-max on ties) and matched_turns = la.
md5-digest equality stands in for sequence equality — the engine-exact,
collision-negligible convention the whole dedup family shares.

Scale shape (10^12-turn corpus):
- ONE shuffle groups (conv_id, turn_idx, 16-byte key) — text never leaves
  the scan stage;
- per-group digest chaining is incremental (hashlib.copy per turn →
  O(turns) total, not O(turns^2) re-hashing); inherently sequential per
  conversation, the same honest trade as packing's greedy kernel — a
  10^8-turn conversation serializes one task (packing's span escape hatch
  cannot apply: a prefix digest is order-dependent across the whole run);
- the candidate join is an equi-join on (digest, m): full-sequence rows
  (one per conversation) against prefix rows (one per turn). Digest
  equality makes matches rare at scale, so AQE's broadcast-or-shuffle
  choice is left to runtime stats;
- winner resolution is a map-side-combinable max(struct) per loser.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

_PREFIX_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("m", T.IntegerType()),
        T.StructField("prefix_h", T.StringType()),
        T.StructField("conv_len", T.IntegerType()),
    ]
)


def _prefix_digests(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("turn_idx")
    keys = pdf["turn_key"].tolist()
    out_m, out_h = [], []
    acc = hashlib.md5()
    for i, k in enumerate(keys):
        if i:
            acc.update(b"|")
        acc.update(k.encode("ascii"))
        out_m.append(i + 1)
        out_h.append(acc.copy().hexdigest())
    n = len(keys)
    return pd.DataFrame(
        {
            "conv_id": pdf["conv_id"].iloc[:1].repeat(n).reset_index(drop=True),
            "m": pd.array(out_m, dtype="int32"),
            "prefix_h": out_h,
            "conv_len": pd.array([n] * n, dtype="int32"),
        }
    )


def conversation_prefix_digests(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """(conv_id, m, prefix_h, conv_len): md5 digest of each conversation's
    first m normalized turn keys, for every m in 1..conv_len."""
    turns = df.filter(F.col(text_col).isNotNull()).select(
        F.col(conv_col).alias("conv_id"),
        F.col(turn_col).cast("int").alias("turn_idx"),
        F.md5(F.lower(F.trim(F.col(text_col)))).alias("turn_key"),
    )
    from .parallel import repartition_for_group_kernel

    # width-pinned exchange: stops AQE coalescing this small shuffle
    # below the core count and serializing the Python kernel (the groupBy
    # reuses the same hash partitioning — still one shuffle)
    turns = repartition_for_group_kernel(turns, "conv_id")
    return turns.groupBy("conv_id").applyInPandas(
        _prefix_digests, schema=_PREFIX_SCHEMA
    )


def prefix_dedup_pairs(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
    min_turns: int = 1,
) -> DataFrame:
    """(loser, winner, matched_turns): conversations whose full normalized
    turn sequence is a prefix of another conversation's. One row per
    loser; winner = the longest superset run (conv_id-max on ties).

    Shape: all matching happens inside ONE (prefix_h, m) window partition
    over the single digest stream — a full row (m == conv_len) loses to
    the bucket's best longer run if any (max(struct(conv_len, conv_id))
    over rows with conv_len > m — a run longer than m always beats an
    equal-length tie), else to the preceding full id in conv_id order
    (= the max id strictly below it, the equal-length rule; the id-min
    full of an identical group has no predecessor and survives). The
    first window establishes the (prefix_h, m) partitioning; the filter
    and the lag window reuse it, so the digest kernel runs ONCE and the
    whole resolution adds exactly one exchange. A self-join formulation
    would re-execute the kernel per side and emit O(k^2) rows for a
    k-way identical-conversation group; this is O(k log k)."""
    d = conversation_prefix_digests(df, conv_col, turn_col, text_col)
    bucket = Window.partitionBy("prefix_h", "m")
    d = d.withColumn(
        "_best_longer",
        F.max(
            F.when(
                F.col("conv_len") > F.col("m"),
                F.struct("conv_len", "conv_id"),
            )
        ).over(bucket),
    )
    fulls = d.filter(F.col("m") == F.col("conv_len"))
    prev_full = F.lag("conv_id").over(
        Window.partitionBy("prefix_h", "m").orderBy("conv_id")
    )
    return (
        fulls.withColumn("_prev", prev_full)
        .withColumn(
            "winner", F.coalesce(F.col("_best_longer.conv_id"), F.col("_prev"))
        )
        .filter(F.col("winner").isNotNull())
        .filter(F.col("conv_len") >= min_turns)
        .select(
            F.col("conv_id").alias("loser"),
            "winner",
            F.col("conv_len").alias("matched_turns"),
        )
    )


def prefix_dedup(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
    min_turns: int = 1,
) -> DataFrame:
    """The corpus with prefix-redundant conversations removed (all turns
    of every loser dropped, winners untouched). Losers anti-join on
    conv_id — the same slim-exchange shape as the pipeline's exact dedup."""
    losers = prefix_dedup_pairs(
        df, conv_col, turn_col, text_col, min_turns
    ).select(F.col("loser").alias(conv_col))
    return df.join(losers, on=conv_col, how="left_anti")
