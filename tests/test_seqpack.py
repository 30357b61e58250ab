"""Fixed-length sequence assembly (operators/seqpack.py) + BPE integer
vocabulary (operators/bpe.py encode_ids/vocab).

Exact mode is verified against a single-node twin that replays the
documented contract from scratch (md5 global order, EOD append, flat
chunking) — full equality of every (seq_id, ids) row, at three
partitionings. Partition mode is verified on a single partition (where
its contract coincides with input-order chunking) plus the invariants
that hold at any partitioning (all-full lengths, token conservation
under keep_partial).
"""

from __future__ import annotations

import hashlib

import pytest

from fineweb_legal_spark.operators import bpe, seqpack

ROWS = [
    ("d1", [5, 6, 7]),
    ("d2", []),  # empty doc: contributes only its EOD
    ("d3", None),  # null array: same as empty
    ("d4", list(range(100, 131))),  # spans many sequences at seq_len=8
    ("d5", [9]),
    (None, [99]),  # null id: dropped in exact mode
    ("d6", [2, 3, 4, 5, 6]),
]
SCHEMA = "doc_id string, ids array<int>"


def twin_exact(rows, seq_len, eod, seed=""):
    docs = [(i, ids) for i, ids in rows if i is not None]
    docs.sort(key=lambda r: hashlib.md5((seed + r[0]).encode()).hexdigest())
    stream: list[int] = []
    for _, ids in docs:
        stream.extend(list(ids or []))
        stream.append(eod)
    return {
        s: stream[s * seq_len : (s + 1) * seq_len]
        for s in range((len(stream) + seq_len - 1) // seq_len)
    }


def as_dict(df):
    return {r["seq_id"]: list(r["ids"]) for r in df.collect()}


@pytest.mark.parametrize("reparts", [1, 7])
def test_exact_mode_equals_twin(spark, reparts):
    df = spark.createDataFrame(ROWS, SCHEMA).repartition(reparts)
    got = as_dict(
        seqpack.assemble_sequences(df, seq_len=8, eod_id=1, keep_partial=True)
    )
    assert got == twin_exact(ROWS, 8, 1)


def test_exact_mode_num_partitions_and_seed_invariant(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    want = twin_exact(ROWS, 8, 1, seed="ep2")
    got = as_dict(
        seqpack.assemble_sequences(
            df, seq_len=8, eod_id=1, num_partitions=3, seed="ep2", keep_partial=True
        )
    )
    assert got == want
    # a different epoch seed yields a different global order (the corpus
    # here is big enough that at least one chunk must differ)
    assert got != twin_exact(ROWS, 8, 1, seed="")


def test_exact_mode_drops_partial_tail_by_default(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    full = twin_exact(ROWS, 8, 1)
    want = {s: ids for s, ids in full.items() if len(ids) == 8}
    got = as_dict(seqpack.assemble_sequences(df, seq_len=8, eod_id=1))
    assert got == want
    assert len(want) < len(full)  # the fixture does have a ragged tail


def test_partition_mode_single_partition_equals_input_order_twin(spark):
    df = spark.createDataFrame(ROWS, SCHEMA).coalesce(1)
    stream: list[int] = []
    for _, ids in ROWS:  # null ids are kept in partition mode (empty doc)
        stream.extend(list(ids or []))
        stream.append(7)
    want = {
        i: stream[i * 6 : (i + 1) * 6] for i in range(len(stream) // 6)
    }
    got = as_dict(
        seqpack.assemble_sequences(df, seq_len=6, eod_id=7, mode="partition")
    )
    assert got == want


def test_partition_mode_invariants_any_partitioning(spark):
    df = spark.createDataFrame(ROWS, SCHEMA).repartition(5)
    total = sum(len(ids or []) + 1 for _, ids in ROWS)
    out = seqpack.assemble_sequences(
        df, seq_len=8, eod_id=1, mode="partition", keep_partial=True
    ).collect()
    assert sum(len(r["ids"]) for r in out) == total  # token conservation
    assert len({r["seq_id"] for r in out}) == len(out)
    full = seqpack.assemble_sequences(df, seq_len=8, eod_id=1, mode="partition")
    assert all(len(r["ids"]) == 8 for r in full.collect())


def test_partition_mode_has_zero_exchange(spark):
    # no .repartition here: that would add its own RoundRobin Exchange
    # upstream of the operator under test
    df = spark.createDataFrame(ROWS, SCHEMA)
    plan = (
        seqpack.assemble_sequences(df, seq_len=8, mode="partition")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_exact_mode_exchanges_are_the_documented_two_plus_tiny(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    plan = (
        seqpack.assemble_sequences(df, seq_len=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the token stream crosses exactly two kinds of exchange: the
    # data-derived bucket hash (global order; NO sampled
    # rangepartitioning anywhere — sampled boundaries diverge between
    # the totals and data executions, the bug this plan shape pins) and
    # the seq_id reassembly; the only other partitionings allowed are
    # the tiny totals/offsets machinery (_pid partial agg, window
    # SinglePartition)
    assert "hashpartitioning(seq_id" in plan
    assert "rangepartitioning" not in plan
    for ln in plan.splitlines():
        s = ln.strip(" +:-")
        if s.startswith("Exchange hashpartitioning"):
            assert "seq_id" in ln or "_pid" in ln, ln
        elif s.startswith("Exchange"):
            assert "SinglePartition" in ln, ln
    # and the in-partition sort must sit above the join, directly under
    # the piece emitter — EliminateSorts removes it below a join child
    above_join = plan.split("BroadcastHashJoin")[0]
    assert "Sort [_pid" in above_join


def test_bpe_vocab_round_trip_and_ids(spark):
    corpus = [("a", "low lower lowest low low"), ("b", "new newer newest")]
    df = spark.createDataFrame(corpus, "doc_id string, text string")
    model = bpe.train_bpe(df, num_merges=12)
    assert model.alphabet  # train_bpe collected the base symbols
    back = bpe.model_from_table(bpe.merges_table(spark, model))
    assert back == model

    vocab = model.vocab()
    assert bpe.UNK_ID not in vocab.values()
    assert bpe.EOD_ID not in vocab.values()
    assert len(set(vocab.values())) == len(vocab)

    # ids decode back to exactly the string-token encoding
    inv = {i: t for t, i in vocab.items()}
    ids = {
        r["doc_id"]: list(r["ids"]) for r in bpe.encode_ids(df, model).collect()
    }
    toks = {
        r["doc_id"]: list(r["tokens"]) for r in bpe.encode_bpe(df, model).collect()
    }
    for k in toks:
        assert [inv[i] for i in ids[k]] == toks[k]

    # unseen characters at encode time fold to UNK, never crash
    oov = spark.createDataFrame([("z", "qqq low")], "doc_id string, text string")
    row = bpe.encode_ids(oov, model).collect()[0]
    assert bpe.UNK_ID in list(row["ids"])

    # the vocab artifact covers every id plus the two reserved rows
    vt = bpe.vocab_table(spark, model).toPandas()
    assert set(vt["id"]) == set(vocab.values()) | {bpe.UNK_ID, bpe.EOD_ID}


def test_encode_ids_feeds_seqpack(spark):
    corpus = [("a", "low lower lowest"), ("b", None), ("c", "new newer")]
    df = spark.createDataFrame(corpus, "doc_id string, text string")
    model = bpe.train_bpe(df, num_merges=8)
    enc = bpe.encode_ids(df, model)
    seqs = seqpack.assemble_sequences(
        enc, seq_len=4, eod_id=bpe.EOD_ID, keep_partial=True
    ).collect()
    total = sum(r["n_tokens"] for r in enc.collect()) + len(corpus)
    assert sum(len(r["ids"]) for r in seqs) == total
    assert sum(list(r["ids"]).count(bpe.EOD_ID) for r in seqs) == len(corpus)
