"""Fixed-length training-sequence assembly ("concat and chunk").

The last step between a tokenized corpus and an autoregressive trainer:
concatenate every document's token ids (each terminated by an EOD
separator) into one global stream and cut it into EXACTLY
``seq_len``-token sequences — the standard GPT-style data prep, where a
sequence may span document boundaries and a long document may span many
sequences. Complements the existing packers: operators/packing.py keeps
sample boundaries (greedy first-fit of whole turns under a budget),
sources/shards.py keeps document boundaries (token-budget shards);
seqpack deliberately ignores both for dense fixed-shape batches.
No reference analog — a training-data toolkit op.

Two modes, because at 10^12 turns they sit at different points of the
determinism/shuffle trade:

- ``mode="exact"`` — the sequence stream is a PURE FUNCTION of the
  corpus: global order = md5(seed || doc_id) (the repo-wide
  deterministic-shuffle convention), global token offsets via a
  distributed prefix sum, then each document emits one
  (seq_id, start, piece) sliver per sequence it touches and a hash
  exchange on seq_id reassembles them JVM-natively (array_sort +
  flatten over collect_list — piece starts within one sequence are
  distinct by construction, so the sort key is total). Cost at scale:
  the token stream crosses the wire twice (the bucket exchange that
  establishes the order, the seq_id exchange that reassembles) — the
  floor for exact global chunking, since tokens must move to the
  sequence that owns them. Identical output at any parallelism;
  resumable loaders can address sequences by seq_id.

  The prefix sum's partition id is NOT ``spark_partition_id()`` over a
  ``repartitionByRange`` — it is derived from the DATA: bucket =
  floor(int(md5[:8], 16) * P / 2^32), a monotone pure function of the
  sort key (md5 keys are uniform, so buckets are balanced range
  partitions with zero sampling). This matters for correctness, not
  style: the per-bucket totals and the data pass are two separate
  executions of the plan, and Spark's RangePartitioner samples its
  boundaries with an RDD-id-dependent seed — column pruning makes the
  two subplans differ, ReuseExchange cannot unify them, and the two
  executions get DIFFERENT boundaries, silently mis-aligning the
  broadcast offsets (measured at 2M rows: ~3% of sequences mis-sized).
  A data-derived bucket is identical in every execution by
  construction; the emitter resets its running sum at bucket
  boundaries, so physical partition layout (hash placement, AQE
  coalescing) is irrelevant.
- ``mode="partition"`` — zero additional exchange: one mapInPandas
  chunks each input partition's concatenated stream locally, carrying
  the remainder across Arrow batches; each partition's ragged tail
  (< seq_len tokens, bounded by seq_len-1 per PARTITION, vanishing at
  scale) is dropped unless ``keep_partial``. This is what streaming
  trainer-loaders actually do; the output depends on the input
  partitioning (documented, not hidden), so seq_id is
  partition-qualified: pid * 2^40 + local index.

Output schema for both: (seq_id long, ids array<int>), every row
exactly ``seq_len`` ids (the single global tail row is shorter iff
``keep_partial``).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

_PID_SHIFT = 2**40  # partition-mode seq_id = pid * 2^40 + local index

_PIECE_SCHEMA = T.StructType(
    [
        T.StructField("seq_id", T.LongType()),
        T.StructField("start", T.IntegerType()),
        T.StructField("piece", T.ArrayType(T.IntegerType())),
    ]
)

_SEQ_SCHEMA = T.StructType(
    [
        T.StructField("seq_id", T.LongType()),
        T.StructField("ids", T.ArrayType(T.IntegerType())),
    ]
)


def _piece_fn(seq_len: int, eod_id: int):
    """Sliver emitter for exact mode. Rows arrive sorted by
    (_pid, _key); the running sum RESETS at every _pid boundary and the
    row's broadcast bucket offset anchors it, so the computed global
    offset is exact regardless of how buckets are placed on physical
    partitions (prefix sums are associative within a bucket)."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        run = 0
        cur_pid = None
        for pdf in it:
            seqs: list[int] = []
            starts: list[int] = []
            pieces: list[list[int]] = []
            offs = pdf["_off"].to_numpy(dtype="int64")
            pids = pdf["_pid"].to_numpy(dtype="int64")
            for toks, off, pid in zip(pdf["ids"], offs, pids):
                if pid != cur_pid:
                    cur_pid, run = pid, 0
                toks = [] if toks is None else list(toks)
                toks.append(eod_id)
                g = int(off) + run
                run += len(toks)
                a = 0
                while a < len(toks):
                    seq = (g + a) // seq_len
                    take = min(len(toks) - a, (seq + 1) * seq_len - (g + a))
                    seqs.append(seq)
                    starts.append((g + a) - seq * seq_len)
                    pieces.append(toks[a : a + take])
                    a += take
            yield pd.DataFrame({"seq_id": seqs, "start": starts, "piece": pieces})

    return fn


def _chunk_fn(seq_len: int, eod_id: int, keep_partial: bool):
    """Partition-local concat-and-chunk for partition mode; remainder
    carried across Arrow batches, one output row per full sequence."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = pid * _PID_SHIFT
        nxt = 0
        rem: list[int] = []
        for pdf in it:
            buf: list[int] = rem
            for toks in pdf["ids"]:
                buf.extend([] if toks is None else toks)
                buf.append(eod_id)
            full = len(buf) // seq_len
            if full:
                yield pd.DataFrame(
                    {
                        "seq_id": [base + nxt + i for i in range(full)],
                        "ids": [
                            buf[i * seq_len : (i + 1) * seq_len]
                            for i in range(full)
                        ],
                    }
                )
                nxt += full
            rem = buf[full * seq_len :]
        if rem and keep_partial:
            yield pd.DataFrame({"seq_id": [base + nxt], "ids": [rem]})

    return fn


def assemble_sequences(
    df: DataFrame,
    seq_len: int,
    eod_id: int = 1,
    id_col: str = "doc_id",
    ids_col: str = "ids",
    mode: str = "exact",
    num_partitions: int | None = None,
    seed: str = "",
    keep_partial: bool = False,
) -> DataFrame:
    """(seq_id, ids[seq_len]) from a tokenized corpus (``encode_ids``
    output or any (id, array<int>) frame). See the module docstring for
    the exact/partition trade; ``seed`` rotates exact mode's
    deterministic global order (distinct epochs), ``num_partitions``
    sets the prefix-sum bucket count (default: the session's shuffle
    partitions; the OUTPUT is identical at any bucket count)."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    src = df.select(
        F.col(id_col).cast("string").alias("_sp_id"),
        F.col(ids_col).cast("array<int>").alias("ids"),
    )
    if mode == "partition":
        return src.select("ids").mapInPandas(
            _chunk_fn(seq_len, eod_id, keep_partial), schema=_SEQ_SCHEMA
        )
    if mode != "exact":
        raise ValueError(f"mode must be 'exact' or 'partition', got {mode!r}")

    # a null array still costs exactly its EOD token (the emitter treats
    # it as an empty document); explicit when() so the count can't
    # inherit size(NULL)'s config-dependent -1/NULL split
    n_ids = F.when(F.col("ids").isNull(), F.lit(0)).otherwise(F.size("ids"))
    # null doc ids have no deterministic place in the global order —
    # dropped, the hash_sample/shards contract
    src = src.filter(F.col("_sp_id").isNotNull())
    n_buckets = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    key = F.md5(F.concat(F.lit(seed), F.col("_sp_id")))
    # _pid = a data-derived, monotone, sampling-free range bucket of the
    # md5 key (see module docstring: spark_partition_id over a sampled
    # range exchange is NOT stable across the totals/data executions)
    pid = F.floor(
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
        * F.lit(int(n_buckets))
        / F.lit(2**32)
    ).cast("long")
    keyed = src.select(
        key.alias("_key"),
        pid.alias("_pid"),
        "ids",
        (n_ids + F.lit(1)).cast("long").alias("tok"),
    )
    data = keyed.repartition(n_buckets, "_pid")
    totals = keyed.groupBy("_pid").agg(F.sum("tok").alias("_total"))
    w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_total").over(w), F.lit(0))
    ).select("_pid", "_off")
    # the in-partition sort sits ABOVE the join, directly under
    # mapInPandas: a sort below a join child is dead code to Catalyst
    # (join output order is unspecified) and EliminateSorts removes it —
    # observed as interleaved buckets reaching the emitter
    pieces = (
        data.join(F.broadcast(offsets), "_pid")
        .sortWithinPartitions("_pid", "_key")
        .mapInPandas(_piece_fn(seq_len, eod_id), schema=_PIECE_SCHEMA)
    )
    seqs = pieces.groupBy("seq_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("start", "piece"))),
                lambda s: s["piece"],
            )
        ).alias("ids")
    )
    if not keep_partial:
        seqs = seqs.filter(F.size("ids") == seq_len)
    return seqs
