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

1. assign every row a BUCKET derived from its sort key — for the md5
   order, floor(int(md5[:8], 16) * P / 2^32): a monotone pure function
   of the key, so bucket i's keys all precede bucket i+1's and (md5
   being uniform) buckets are balanced — then hash-repartition on the
   bucket + in-partition sort by (bucket, key);
2. per-bucket token totals (map-side combinable agg — a pure function
   of the DATA, independent of physical partition layout) feed an
   unpartitioned running-offset window over the bucket-count-sized
   frame (tiny by construction);
3. offsets broadcast back; a mapInPandas pass streams each task's rows
   in order, resetting the running local sum at bucket boundaries — no
   further exchange, text untouched.

Why the bucket is derived from the key and NOT ``spark_partition_id()``
over a ``repartitionByRange``: the totals and the data pass are two
separate executions of the plan; Spark's RangePartitioner samples its
boundaries with an RDD-id-dependent seed, and column pruning makes the
two subplans differ so ReuseExchange cannot unify them — the two
executions then get DIFFERENT boundaries and the broadcast offsets
mis-align (measured at 2M rows before this fix: ~2% of start_tok
values gapped or overlapped). A data-derived bucket is identical in
every execution by construction. The curriculum path (arbitrary order
keys, no uniform bucket function) keeps the sampled range exchange but
PERSISTS the slim keyed frame so both branches read one
materialization with one boundary set.

The local running sum plus the broadcast bucket offset IS the exact
global prefix sum (prefix sums are associative within a bucket; the
exchange hashes on the bucket so a bucket never spans tasks), so shard
ids are stable across cluster sizes — the DuckDB oracle recomputes
them as one ordered window.
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
    """Rows arrive sorted by (_pid, _key); the running sum RESETS at
    every _pid boundary and the row's broadcast bucket offset anchors
    it — vectorized per batch via a segmented cumsum (bucket placement
    on physical partitions is irrelevant; a bucket never spans tasks
    because the exchange hashes on _pid)."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        run = 0  # tokens already emitted for cur_pid in earlier batches
        cur_pid = None
        for pdf in it:
            tok = pdf["tok"].to_numpy(dtype="int64")
            pids = pdf["_pid"].to_numpy(dtype="int64")
            n = len(tok)
            if n == 0:
                continue
            batch_starts = np.cumsum(tok) - tok  # batch-local prefix sum
            new_seg = np.concatenate(([True], pids[1:] != pids[:-1]))
            seg_id = np.cumsum(new_seg) - 1
            # per-row start within its pid segment = batch-local prefix
            # minus the prefix at the segment's first row
            starts = batch_starts - batch_starts[new_seg][seg_id]
            if cur_pid is not None and pids[0] == cur_pid:
                starts[seg_id == 0] += run  # continue the carried segment
            run = int(starts[-1] + tok[-1])
            cur_pid = int(pids[-1])
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
    tie-break. The curriculum path persists its slim keyed frame
    (doc_id, tok, key — never text) for the lifetime of the session to
    pin one set of sampled range boundaries across the totals and data
    executions (see the module docstring)."""
    tok = (
        F.col(tok_col)
        if tok_col
        else F.greatest(
            F.lit(1),
            F.floor(F.length(F.coalesce(F.col(text_col), F.lit(""))) / 4),
        )
    ).cast("long")
    n_buckets = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    if order_by is None:
        # ``seed`` rotates the deterministic shuffle (distinct epoch
        # orders that are each still a pure function of the corpus).
        # The prefix-sum bucket is DERIVED FROM THE KEY (monotone,
        # sampling-free: md5 is uniform, so a scaled 32-bit prefix is a
        # balanced range partitioning) instead of spark_partition_id
        # over repartitionByRange: the totals branch and the data
        # branch are two separate executions, RangePartitioner samples
        # boundaries with an RDD-id-dependent seed, and column pruning
        # keeps ReuseExchange from unifying the subplans — so sampled
        # boundaries DIVERGE between the executions and the broadcast
        # offsets silently mis-align (measured at 2M rows: ~2% of
        # start_tok values gapped/overlapped before this fix).
        key = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
        pid = F.floor(
            F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
            * F.lit(int(n_buckets))
            / F.lit(2**32)
        ).cast("long")
        keyed = df.select(
            F.col(id_col).alias("doc_id"),
            tok.alias("tok"),
            F.struct(key).alias("_key"),
            pid.alias("_pid"),
        ).repartition(n_buckets, "_pid")
    else:
        if isinstance(order_by, (list, tuple)):
            order_cols = list(order_by) + [F.col(id_col)]
        else:
            order_cols = [order_by, F.col(id_col)]
        # arbitrary order keys have no uniform-hash bucket function, so
        # this path keeps the sampled range exchange — and PERSISTS the
        # slim keyed frame (doc_id, tok, key — never text) so the
        # totals and data branches read ONE materialization with ONE
        # set of boundaries instead of re-sampling per execution
        keyed = (
            df.select(
                F.col(id_col).alias("doc_id"),
                tok.alias("tok"),
                F.struct(*order_cols).alias("_key"),
            )
            .repartitionByRange(n_buckets, F.col("_key"))
            .withColumn("_pid", F.spark_partition_id())
            .persist()
        )
    totals = keyed.groupBy("_pid").agg(F.sum("tok").alias("_total"))
    w = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # unpartitioned window over the per-partition totals: one row per
    # bucket — the class_weights tiny-frame convention, never the corpus
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
    # the in-partition sort sits ABOVE the join, directly under
    # mapInPandas: a sort below a join child is dead code to Catalyst
    # (join output order is unspecified) and EliminateSorts removes it
    return (
        keyed.join(F.broadcast(offsets), "_pid")
        .sortWithinPartitions("_pid", "_key")
        .mapInPandas(_cumshard_fn(budget), schema=schema)
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
