"""Greedy sample packing: turns → token-budgeted training chunks.

The last mile of a training-data pipeline: ordered turns of a
conversation are packed front-to-back into chunks whose token estimate
stays within `budget`; a chunk closes when the next turn would overflow
it (a single turn larger than the budget gets a chunk of its own). This
is inherently sequential PER CONVERSATION (each boundary depends on the
running remainder, so no window/cumsum expresses it) — the (b) rung of
the custom-operator ladder: an Arrow-batched grouped-map UDF, one group
per conversation.

Scale shape: one shuffle (groupBy conv_id), then per-group work with no
cross-group coordination. Two defenses against a pathological 10^8-turn
conversation pinning its task:

1. The greedy kernel is per-CHUNK, not per-turn: each chunk boundary is
   one ``np.searchsorted`` into the token cumsum (the maximal prefix with
   sum <= budget IS the greedy chunk), so task time is
   O(n for the cumsum + chunks * log n) — a 100k-turn conversation packs
   in milliseconds (asserted in tests).
2. ``span_turns`` pre-splits giant conversations into fixed-length turn
   spans that pack as independent parallel groups, for the regime where
   even the slim (conv_id, turn_idx, tok) rows of ONE conversation
   overflow a single Arrow group (~10^8 turns). Chunks then never span a
   span boundary — deliberately weaker than global greedy (an exact
   cross-span greedy would need per-span state-function composition,
   which buys nothing until conversations outgrow executor memory);
   chunk_idx stays globally sequential per conversation via a per-span
   chunk-count prefix sum.

The correctness oracle is a DuckDB *recursive CTE* carrying
(running-total, chunk-index) across row_number order — an independent
implementation of the same recurrence (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PACK_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("chunk_idx", T.IntegerType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("tokens", T.LongType()),
        T.StructField("first_turn", T.IntegerType()),
        T.StructField("last_turn", T.IntegerType()),
    ]
)


def _pack_group(budget: int):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("turn_idx")
        turns = pdf["turn_idx"].to_numpy()
        cum = pdf["tok"].to_numpy(dtype="int64").cumsum()
        n = len(cum)
        # greedy chunk = maximal prefix with sum <= budget (an oversized
        # single turn becomes a singleton chunk): per-chunk searchsorted on
        # the cumsum, identical boundaries to the per-turn greedy scan but
        # O(chunks * log n) instead of O(n) Python iterations
        starts: list[int] = []
        ends: list[int] = []
        i = 0
        while i < n:
            base = cum[i - 1] if i > 0 else 0
            j = int(np.searchsorted(cum, base + budget, side="right")) - 1
            if j < i:
                j = i
            starts.append(i)
            ends.append(j)
            i = j + 1
        s = np.array(starts, dtype="int64")
        e = np.array(ends, dtype="int64")
        base = np.where(s > 0, cum[s - 1], 0)
        return pd.DataFrame(
            {
                "conv_id": pdf["conv_id"].iloc[0],
                "chunk_idx": np.arange(len(s), dtype="int32"),
                "n_turns": e - s + 1,
                "tokens": cum[e] - base,
                "first_turn": turns[s].astype("int32"),
                "last_turn": turns[e].astype("int32"),
            }
        )

    return fn


def pack_turns(
    df: DataFrame,
    budget: int,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
    span_turns: int | None = None,
) -> DataFrame:
    """Pack each conversation's turns (ordered by `turn_col`) into chunks
    of estimated-token sum <= budget (reference token estimate F16:
    max(1, len//4)); oversized single turns become singleton chunks.
    Returns one row per chunk with turn range and totals.

    ``span_turns`` (None = exact global greedy, the default): pre-split
    every conversation into fixed ``span_turns``-length spans packed as
    independent parallel tasks — the giant-conversation escape hatch (see
    module doc for the semantics trade)."""
    toks = df.select(
        F.col(conv_col).alias("conv_id"),
        F.col(turn_col).cast("int").alias("turn_idx"),
        F.greatest(F.lit(1), F.floor(F.length(F.coalesce(text_col, F.lit(""))) / 4))
        .cast("long")
        .alias("tok"),
    )
    from .parallel import repartition_for_group_kernel

    if span_turns is None:
        return repartition_for_group_kernel(toks, "conv_id").groupBy(
            "conv_id"
        ).applyInPandas(_pack_group(budget), schema=_PACK_SCHEMA)
    # pre-split on fixed turn_idx ranges — NOT a row_number window, which
    # would itself sort the whole giant conversation in one task (the
    # exact skew being escaped). Sparse turn_idx just yields smaller
    # spans, never larger. Pack each (conv, span) group in parallel, then
    # shift each span's local chunk_idx by the running chunk count of
    # earlier spans — a prefix-sum window over the tiny per-span counts,
    # never over the turns.
    spanned = toks.withColumn(
        "_span", F.floor(F.col("turn_idx") / F.lit(span_turns)).cast("long")
    )
    packed = repartition_for_group_kernel(spanned, "conv_id", "_span").groupBy(
        "conv_id", "_span"
    ).applyInPandas(_pack_span_group(budget), schema=_PACK_SPAN_SCHEMA)
    woff = (
        Window.partitionBy("conv_id")
        .orderBy("_span")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    counts = packed.groupBy("conv_id", "_span").agg(
        F.count(F.lit(1)).alias("_n_chunks")
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n_chunks").over(woff), F.lit(0))
    ).select("conv_id", "_span", "_off")
    return (
        packed.join(F.broadcast(offsets), ["conv_id", "_span"])
        .select(
            "conv_id",
            (F.col("chunk_idx") + F.col("_off")).cast("int").alias("chunk_idx"),
            "n_turns",
            "tokens",
            "first_turn",
            "last_turn",
        )
    )


_PACK_SPAN_SCHEMA = T.StructType(
    [T.StructField("_span", T.LongType()), *_PACK_SCHEMA.fields]
)


def _pack_span_group(budget: int):
    inner = _pack_group(budget)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out = inner(pdf.drop(columns=["_span"]))
        out.insert(0, "_span", pdf["_span"].iloc[0])
        return out

    return fn
