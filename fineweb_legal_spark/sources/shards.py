"""Deterministic token-budget shard planning (training-shard writer prep).

Trainers consume a corpus as fixed-token-budget shards in a globally
shuffled but REPRODUCIBLE order (retries, multi-host data loading, and
resumable epochs all need shard contents to be a pure function of the
corpus). This operator assigns every document a shard id such that:

- global order is the md5 of the document id (engine- and
  partitioning-independent shuffle — the repo-wide determinism
  convention shared with hash_sample/mixture);
- shard = floor(running token offset / budget) at the document's START
  offset — so shard boundaries never split a document, every shard's
  token sum is >= budget only by the tail of its one straddling
  document, and the assignment equals the single-threaded greedy
  first-fit over the shuffled order.

No reference analog — a training-data toolkit op.

Scale shape (10^12 docs): a naive global-cumsum window is ONE task.
Instead the classic distributed prefix sum:

1. range-repartition on the md5 key + in-partition sort (one shuffle;
   range boundaries guarantee pid i's keys all precede pid i+1's);
2. per-partition token totals (map-side combinable agg on the SAME
   exchange — Spark's exchange reuse dedups the scan+shuffle) feed an
   unpartitioned running-offset window over the partition-count-sized
   frame (tiny by construction: one row per shuffle partition);
3. offsets broadcast back; a mapInPandas pass streams each partition in
   order, carrying the running local sum across Arrow batches — no
   further exchange, text untouched.

The row order mapInPandas sees is the in-partition sort order, so the
local running sum plus the broadcast offset IS the exact global prefix
sum. Partition boundaries cannot change the result (prefix sums are
associative), so shard ids are stable across cluster sizes — the
DuckDB oracle recomputes them as one ordered window.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def _cumshard_fn(budget: int):
    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        run = 0
        for pdf in it:
            tok = pdf["tok"].to_numpy(dtype="int64")
            starts = run + np.concatenate(([0], np.cumsum(tok[:-1])))
            run += int(tok.sum())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "shard_id": (pdf["_off"].to_numpy(dtype="int64") + starts)
                    // budget,
                    "start_tok": pdf["_off"].to_numpy(dtype="int64") + starts,
                }
            )

    return fn


def assign_token_shards(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tok_col: str | None = None,
    num_partitions: int | None = None,
    order_by=None,
    seed: str = "",
) -> DataFrame:
    """(doc_id, shard_id, start_tok): deterministic first-fit shard
    assignment over the md5(id)-shuffled corpus. ``tok_col`` overrides
    the default F16 token estimate max(1, len(text)//4). ``order_by``
    (a plain Column or list of Columns — no .asc()/.desc(), ordering is
    ascending over the column tuple; negate a numeric column for
    descending) replaces the md5 shuffle with an explicit curriculum
    order — e.g. a quality score so early shards hold the easiest
    documents; the doc id is always appended as the deterministic
    tie-break."""
    tok = (
        F.col(tok_col)
        if tok_col
        else F.greatest(
            F.lit(1),
            F.floor(F.length(F.coalesce(F.col(text_col), F.lit(""))) / 4),
        )
    ).cast("long")
    if order_by is None:
        # ``seed`` rotates the deterministic shuffle (distinct epoch
        # orders that are each still a pure function of the corpus)
        order_cols = [
            F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
        ]
    elif isinstance(order_by, (list, tuple)):
        order_cols = list(order_by) + [F.col(id_col)]
    else:
        order_cols = [order_by, F.col(id_col)]
    keyed = df.select(
        F.col(id_col).alias("doc_id"),
        tok.alias("tok"),
        F.struct(*order_cols).alias("_key"),
    )
    parts = [F.col("_key")]
    keyed = (
        (
            keyed.repartitionByRange(num_partitions, *parts)
            if num_partitions
            else keyed.repartitionByRange(*parts)
        )
        .sortWithinPartitions("_key")
        .withColumn("_pid", F.spark_partition_id())
    )
    totals = keyed.groupBy("_pid").agg(F.sum("tok").alias("_total"))
    w = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # unpartitioned window over the per-partition totals: one row per
    # shuffle partition — the class_weights tiny-frame convention, never
    # the corpus
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_total").over(w), F.lit(0))
    ).select("_pid", "_off")
    schema = T.StructType(
        [
            T.StructField("doc_id", df.schema[id_col].dataType),
            T.StructField("shard_id", T.LongType()),
            T.StructField("start_tok", T.LongType()),
        ]
    )
    return keyed.join(F.broadcast(offsets), "_pid").mapInPandas(
        _cumshard_fn(budget), schema=schema
    )


def write_token_shards(
    df: DataFrame,
    path: str,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    **assign_kwargs,
) -> None:
    """Materialize the corpus as shard_id=N/ parquet directories (one
    writer task per shard via an explicit shard repartition). Extra
    keyword arguments (order_by, seed, ...) pass through to
    assign_token_shards."""
    assignment = assign_token_shards(
        df, budget, id_col=id_col, text_col=text_col, **assign_kwargs
    ).select(F.col("doc_id").alias("_shard_doc_id"), "shard_id")
    (
        df.join(assignment, df[id_col] == F.col("_shard_doc_id"), "inner")
        .drop("_shard_doc_id")
        .repartition("shard_id")
        .write.partitionBy("shard_id")
        .mode("overwrite")
        .parquet(path)
    )
