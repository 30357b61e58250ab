"""Sinks (S4/S9/S10/S11) + hash splits (create_dataset_splits analog)."""

from __future__ import annotations

import json
import shutil

from fineweb_legal_spark.datasets import DATA_DIR

OUT = DATA_DIR / "tmp" / "sinks_test"


def test_sinks_roundtrip(spark):
    from fineweb_legal_spark.sources.sinks import (
        merge_parquet,
        write_csv_audit,
        write_json_sidecar,
        write_parquet_batches,
    )

    shutil.rmtree(OUT, ignore_errors=True)
    df = spark.range(1000).withColumnRenamed("id", "k")
    write_parquet_batches(df, OUT / "batches", max_records_per_file=100)
    back = spark.read.parquet(str(OUT / "batches"))
    assert back.count() == 1000
    files = list((OUT / "batches").glob("*.parquet"))
    assert len(files) >= 10  # micro-batch granularity honored

    assert merge_parquet(spark, OUT / "batches", OUT / "merged", 1) == 1000
    assert len(list((OUT / "merged").glob("*.parquet"))) == 1

    write_csv_audit(df.limit(5), OUT / "audit_csv")
    assert spark.read.option("header", "true").csv(str(OUT / "audit_csv")).count() == 5

    write_json_sidecar({"total": 1000, "passed": 42}, OUT / "state.json")
    assert json.loads((OUT / "state.json").read_text())["passed"] == 42
    shutil.rmtree(OUT, ignore_errors=True)


def test_hash_splits_disjoint_and_stable(spark):
    from fineweb_legal_spark.operators.splits import assign_splits, split_overlap_count

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    s = assign_splits(docs, "doc_id")
    counts = {r["split"]: r["count"] for r in s.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    total = sum(counts.values())
    assert counts["train"] / total > 0.55  # ~0.70 with hash noise at n=500
    for a, b in (("train", "val"), ("train", "test"), ("val", "test")):
        assert split_overlap_count(s, "doc_id", a, b) == 0
    # stability: same assignment on re-read (no RNG anywhere)
    s2 = assign_splits(docs, "doc_id")
    assert (
        s.select("doc_id", "split").exceptAll(s2.select("doc_id", "split")).count() == 0
    )


def test_assign_token_shards_deterministic_and_greedy(spark, tmp_path):
    """Shard ids are a pure function of the corpus (stable across input
    partitionings), match the single-threaded greedy first-fit over the
    md5-shuffled order, and never split a document."""
    import pandas as pd
    from pyspark.sql import functions as F

    from fineweb_legal_spark.sources.shards import (
        assign_token_shards,
        write_token_shards,
    )

    d = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w " * 30), F.col("id").cast("string")).alias("text"),
    )
    a = assign_token_shards(d, budget=100).toPandas()
    b = assign_token_shards(
        d.repartition(7), budget=100, num_partitions=3
    ).toPandas()
    key = lambda p: p.sort_values("doc_id").reset_index(drop=True)
    assert key(a).equals(key(b))

    # greedy twin: md5 order, running start offset
    import hashlib

    pdf = d.toPandas()
    pdf["tok"] = pdf["text"].str.len().floordiv(4).clip(lower=1)
    pdf["key"] = pdf["doc_id"].map(
        lambda i: hashlib.md5(str(i).encode()).hexdigest()
    )
    pdf = pdf.sort_values("key").reset_index(drop=True)
    pdf["start"] = pdf["tok"].cumsum().shift(1, fill_value=0)
    pdf["shard"] = pdf["start"] // 100
    want = pdf.set_index("doc_id")["shard"].to_dict()
    got = a.set_index("doc_id")["shard_id"].to_dict()
    assert got == {k: int(v) for k, v in want.items()}

    # writer round-trip: every document lands in exactly its shard dir
    out = str(tmp_path / "shards")
    write_token_shards(d, out, budget=100)
    back = spark.read.parquet(out)
    j = back.select("doc_id", F.col("shard_id").cast("long").alias("s")).join(
        assign_token_shards(d, budget=100).select("doc_id", "shard_id"),
        "doc_id",
    )
    assert j.filter("s <> shard_id").count() == 0
    assert back.count() == 200


def test_assign_token_shards_curriculum_order(spark):
    """order_by replaces the md5 shuffle: ascending token count packs the
    shortest documents into the earliest shards."""
    from pyspark.sql import functions as F

    from fineweb_legal_spark.sources.shards import assign_token_shards

    d = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.expr("repeat('x ', CAST(4 + id * 4 AS INT))").alias("text"),
    )
    a = assign_token_shards(d, budget=500, order_by=F.length("text")).toPandas()
    # doc ids were generated in increasing length order, so shard ids
    # must be non-decreasing in doc_id
    a = a.sort_values("doc_id").reset_index(drop=True)
    assert (a["shard_id"].diff().fillna(0) >= 0).all()
    assert a["shard_id"].iloc[0] == 0 and a["shard_id"].iloc[-1] > 0


def test_prefix_sum_tiles_exactly_at_many_buckets(spark):
    """Scale-regression pin for the distributed prefix sum (shards +
    seqpack share the machinery): at 60k docs across MANY buckets the
    start offsets must tile [0, total) exactly — no gaps, no overlaps.

    This is the shape that caught two real bugs the 200-row fixtures
    could not see: (a) spark_partition_id over a sampled range exchange
    diverges between the totals and data executions (RangePartitioner
    seeds by RDD id; column pruning defeats ReuseExchange), and (b)
    EliminateSorts silently drops a sortWithinPartitions below a join
    child, interleaving buckets at the emitter."""
    import numpy as np
    from pyspark.sql import functions as F

    from fineweb_legal_spark.sources.shards import assign_token_shards

    d = spark.range(60_000).select(
        F.col("id").alias("doc_id"),
        F.expr("repeat('w ', CAST(1 + pmod(id, 97) AS INT))").alias("text"),
    )

    def check(assignment):
        pdf = (
            assignment.join(
                d.select(
                    "doc_id",
                    F.greatest(
                        F.lit(1), F.floor(F.length("text") / 4)
                    ).cast("long").alias("tok"),
                ),
                "doc_id",
            )
            .orderBy("start_tok")
            .select("start_tok", "tok")
            .toPandas()
        )
        starts = pdf["start_tok"].to_numpy()
        toks = pdf["tok"].to_numpy()
        assert starts[0] == 0
        assert (starts[1:] == (starts + toks)[:-1]).all()
        return int(toks.sum())

    check(assign_token_shards(d, budget=1_000, num_partitions=64))
    # curriculum path (sampled range exchange + persisted keyed frame)
    check(
        assign_token_shards(
            d, budget=1_000, num_partitions=64, order_by=F.length("text")
        )
    )

    # seqpack exact mode over the same corpus: full tiling into seq_len
    from fineweb_legal_spark.operators.seqpack import assemble_sequences

    enc = d.select(
        "doc_id",
        F.array_repeat(F.lit(2), (F.pmod("doc_id", 53) + 1).cast("int")).alias(
            "ids"
        ),
    )
    total = enc.agg(
        F.sum(F.size("ids")).cast("long") + F.count(F.lit(1))
    ).collect()[0][0]
    got = assemble_sequences(
        enc, seq_len=512, eod_id=1, keep_partial=True, num_partitions=64
    ).agg(
        F.count(F.lit(1)).alias("seqs"),
        F.sum(F.size("ids")).alias("tok"),
        F.sum((F.size("ids") == 512).cast("int")).alias("full"),
        F.countDistinct("seq_id").alias("dseq"),
    ).collect()[0]
    assert got["tok"] == total
    assert got["full"] == total // 512
    assert got["seqs"] == got["dseq"] == total // 512 + (total % 512 > 0)
