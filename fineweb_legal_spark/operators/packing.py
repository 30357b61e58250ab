"""Greedy sample packing: turns → token-budgeted training chunks.

The last mile of a training-data pipeline: ordered turns of a
conversation are packed front-to-back into chunks whose token estimate
stays within `budget`; a chunk closes when the next turn would overflow
it (a single turn larger than the budget gets a chunk of its own). This
is inherently sequential PER CONVERSATION (each boundary depends on the
running remainder, so no window/cumsum expresses it) — the (b) rung of
the custom-operator ladder: an Arrow-batched grouped-map UDF, one group
per conversation.

Scale shape: one shuffle (groupBy conv_id), then per-group work linear in
the conversation's turn count with no cross-group coordination. A
pathological 10^8-turn conversation would pin its task; the mitigation is
hierarchical: pre-split such conversations on fixed cumsum boundaries
(window arithmetic, parallel), pack each span, then merge only the
boundary chunks — same greedy result, bounded task size. Not implemented
here because real transcripts cap at ~10^3 turns.

The correctness oracle is a DuckDB *recursive CTE* carrying
(running-total, chunk-index) across row_number order — an independent
implementation of the same recurrence (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
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
        pdf = pdf.sort_values("turn_idx")
        chunks: list[tuple] = []
        acc = 0
        chunk = 0
        n = 0
        first = None
        last = None
        for turn, w in zip(pdf["turn_idx"], pdf["tok"]):
            if n > 0 and acc + w > budget:
                chunks.append((pdf["conv_id"].iloc[0], chunk, n, acc, first, last))
                chunk += 1
                acc = 0
                n = 0
                first = None
            acc += int(w)
            n += 1
            last = int(turn)
            if first is None:
                first = int(turn)
        if n > 0:
            chunks.append((pdf["conv_id"].iloc[0], chunk, n, acc, first, last))
        return pd.DataFrame(
            chunks,
            columns=[
                "conv_id", "chunk_idx", "n_turns", "tokens",
                "first_turn", "last_turn",
            ],
        )

    return fn


def pack_turns(
    df: DataFrame,
    budget: int,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Pack each conversation's turns (ordered by `turn_col`) into chunks
    of estimated-token sum <= budget (reference token estimate F16:
    max(1, len//4)); oversized single turns become singleton chunks.
    Returns one row per chunk with turn range and totals."""
    toks = df.select(
        F.col(conv_col).alias("conv_id"),
        F.col(turn_col).cast("int").alias("turn_idx"),
        F.greatest(F.lit(1), F.floor(F.length(F.coalesce(text_col, F.lit(""))) / 4))
        .cast("long")
        .alias("tok"),
    )
    return toks.groupBy("conv_id").applyInPandas(
        _pack_group(budget), schema=_PACK_SCHEMA
    )
