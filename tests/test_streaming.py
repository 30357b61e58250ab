"""Structured Streaming path: availableNow micro-batches, checkpointed
exactly-once sink, watermarked dedup, windowed conv metrics, and
resume-without-reprocessing on restart."""

from __future__ import annotations

import shutil

import pyarrow.parquet as pq

from fineweb_legal_spark.datasets import DATA_DIR, ensure_transcripts
from fineweb_legal_spark.streaming.filter_stream import (
    start_conv_metrics_stream,
    start_filter_stream,
)

BASE = DATA_DIR / "tmp" / "stream_test"


def _setup_source() -> str:
    shutil.rmtree(BASE, ignore_errors=True)
    src = BASE / "src"
    src.mkdir(parents=True)
    t = pq.read_table(ensure_transcripts("t1"))
    half = len(t) // 2
    pq.write_table(t.slice(0, half), src / "part-0.parquet")
    pq.write_table(t.slice(half), src / "part-1.parquet")
    return str(src)


def test_stream_filter_exactly_once(spark):
    src = _setup_source()
    out, cp = str(BASE / "out"), str(BASE / "cp")
    q = start_filter_stream(spark, src, out, cp)
    q.awaitTermination(300)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0
    got = spark.read.parquet(out).toPandas()
    assert not got.duplicated(subset=["conv_id", "turn_idx"]).any()
    assert got["scrubbed_text"].notna().all()

    # restart with the same checkpoint: no new input -> no new rows
    q2 = start_filter_stream(spark, src, out, cp)
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == n1

    # new file arrives -> only the increment is processed
    t = pq.read_table(ensure_transcripts("t1"))
    pq.write_table(t.slice(0, 50), BASE / "src" / "part-2.parquet")
    q3 = start_filter_stream(spark, src, out, cp)
    q3.awaitTermination(300)
    n3 = spark.read.parquet(out).count()
    assert n3 >= n1  # appended increment only (dups of earlier keys dropped)


def test_stream_conv_metrics(spark):
    src = _setup_source()
    out, cp = str(BASE / "mout"), str(BASE / "mcp")
    q = start_conv_metrics_stream(spark, src, out, cp)
    q.awaitTermination(300)
    m = spark.read.parquet(out).toPandas()
    assert len(m) > 0
    assert (m.kept + m.dropped > 0).all()
    shutil.rmtree(BASE, ignore_errors=True)


def test_stream_conv_state(spark):
    """applyInPandasWithState running per-conversation aggregates: the last
    Update-mode row per conversation equals the batch ground truth."""
    src = _setup_source()
    from fineweb_legal_spark.streaming.conv_state import start_conv_state_stream

    q = start_conv_state_stream(spark, src, table_name="conv_state_test")
    q.awaitTermination(300)
    got = spark.sql("SELECT * FROM conv_state_test").toPandas()
    # cumulative rows are monotone in `turns`; the max-turns row per conv
    # is the final state
    final = (
        got.sort_values("turns").groupby("conv_id").tail(1).set_index("conv_id")
    )

    truth = (
        pq.read_table(ensure_transcripts("t1"))
        .to_pandas()
        .assign(words=lambda d: d.text.fillna("").str.split().map(len))
        .groupby("conv_id")
        .agg(turns=("turn_idx", "size"), total_words=("words", "sum"),
             max_turn_idx=("turn_idx", "max"))
    )
    assert len(final) == len(truth)
    for cid, row in truth.iterrows():
        f = final.loc[cid]
        assert int(f.turns) == int(row.turns), cid
        assert int(f.total_words) == int(row.total_words), cid
        assert int(f.max_turn_idx) == int(row.max_turn_idx), cid
    shutil.rmtree(BASE, ignore_errors=True)


def test_stream_session_windows(spark):
    """Streaming session_window result must be a subset of the batch twin,
    and must contain every session finalized before the terminal
    watermark (append mode emits exactly the watermark-passed windows)."""
    import pandas as pd
    import pyspark.sql.functions as F

    from fineweb_legal_spark.streaming.filter_stream import start_session_stream

    src = _setup_source()
    out, cp = str(BASE / "swout"), str(BASE / "swcp")
    q = start_session_stream(spark, src, out, cp)
    q.awaitTermination(300)
    got = spark.read.parquet(out).toPandas()
    assert len(got) > 0

    batch = (
        spark.read.parquet(src)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "conv_id",
            "n_turns",
        )
        .toPandas()
    )

    def key(d):
        return set(
            map(tuple, d[["conv_id", "sess_start", "sess_end", "n_turns"]]
                .astype(str).values)
        )

    gset, bset = key(got), key(batch)
    assert gset <= bset
    max_ts = spark.read.parquet(src).agg(F.max("ts")).first()[0]
    wm = max_ts - pd.Timedelta(hours=1)
    finalized = batch[pd.to_datetime(batch.sess_end) < wm]
    assert key(finalized) <= gset
    shutil.rmtree(BASE, ignore_errors=True)


def test_stream_dedup_watermark_contract(spark):
    """The documented bounded-state trade: a duplicate norm_key WITHIN the
    1-hour watermark is dropped; the same key arriving AFTER the watermark
    passed its first occurrence is emitted again (state evicted) — unlike
    the batch pipeline's global dedup."""
    import pandas as pd
    import pyarrow as pa

    base = DATA_DIR / "tmp" / "stream_wm_test"
    shutil.rmtree(base, ignore_errors=True)
    src = base / "src"
    src.mkdir(parents=True)
    out, cp = str(base / "out"), str(base / "cp")

    # two raw texts the filter keeps (from the t1 golden join)
    golden = pd.read_parquet(DATA_DIR / "golden/t1/golden_verdicts.parquet")
    turns = pq.read_table(ensure_transcripts("t1")).to_pandas()
    kept = turns.merge(
        golden[golden.keep][["conv_id", "turn_idx"]], on=["conv_id", "turn_idx"]
    )
    texts = kept.drop_duplicates("text").text.tolist()
    ta, tb = texts[0], texts[1]

    schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
        ]
    )

    def write(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
            src / name,
        )

    t0 = "2025-06-01 00:00:00"
    # batch 1: first occurrence of ta's key
    write("f1.parquet", [("wm1", 0, "user", ta, None, t0)])
    start_filter_stream(spark, str(src), out, cp).awaitTermination(300)
    # batch 2: a near-in-time duplicate (dropped — state alive) plus an
    # unrelated late row that advances the watermark past t0 + 1h
    write(
        "f2.parquet",
        [
            ("wm2", 0, "user", ta, None, "2025-06-01 00:10:00"),
            ("wm3", 0, "user", tb, None, "2025-06-01 03:00:00"),
        ],
    )
    start_filter_stream(spark, str(src), out, cp).awaitTermination(300)
    # batch 3: same key again, now AFTER the watermark passed t0 -> emitted
    write("f3.parquet", [("wm4", 0, "user", ta, None, "2025-06-01 03:00:00")])
    start_filter_stream(spark, str(src), out, cp).awaitTermination(300)

    got = spark.read.parquet(out).toPandas()
    convs = set(got.conv_id)
    assert "wm1" in convs          # first occurrence kept
    assert "wm2" not in convs      # within-watermark duplicate dropped
    assert "wm3" in convs          # watermark advancer kept
    assert "wm4" in convs          # post-eviction duplicate emitted again
    shutil.rmtree(base, ignore_errors=True)


def test_registry_stream_never_evicts(spark):
    """Registry-backed dedup keeps the reference's never-forgetting
    contract: the same norm_key re-arriving HOURS past any watermark, in a
    later batch, is still dropped — and restarts add nothing."""
    import pandas as pd
    import pyarrow as pa

    from fineweb_legal_spark.streaming.registry_stream import (
        start_registry_filter_stream,
    )

    base = DATA_DIR / "tmp" / "stream_reg_test"
    shutil.rmtree(base, ignore_errors=True)
    src = base / "src"
    src.mkdir(parents=True)
    out, cp, reg = str(base / "out"), str(base / "cp"), str(base / "reg")

    golden = pd.read_parquet(DATA_DIR / "golden/t1/golden_verdicts.parquet")
    turns = pq.read_table(ensure_transcripts("t1")).to_pandas()
    kept = turns.merge(
        golden[golden.keep][["conv_id", "turn_idx"]], on=["conv_id", "turn_idx"]
    )
    ta, tb = kept.drop_duplicates("text").text.tolist()[:2]

    schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
        ]
    )

    def write(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
            src / name,
        )

    def run():
        start_registry_filter_stream(spark, str(src), out, cp, reg).awaitTermination(
            300
        )

    write("f1.parquet", [("rg1", 0, "user", ta, None, "2025-06-01 00:00:00")])
    run()
    # same key 3 hours later in a NEW batch — watermark dedup would
    # re-emit; the registry must drop it
    write("f2.parquet", [("rg2", 0, "user", ta, None, "2025-06-01 03:00:00")])
    run()
    write("f3.parquet", [("rg3", 0, "user", tb, None, "2025-06-01 06:00:00")])
    run()

    got = spark.read.parquet(f"{out}/batch=*").toPandas()
    assert set(got.conv_id) == {"rg1", "rg3"}
    # restart with nothing new: no additional rows
    run()
    again = spark.read.parquet(f"{out}/batch=*").toPandas()
    assert len(again) == len(got)
    shutil.rmtree(base, ignore_errors=True)


def test_registry_stream_replay_idempotent(spark):
    """foreachBatch replay (crash after the writes, before the checkpoint
    commit) must reproduce the first attempt byte-for-byte: the batch's
    OWN registry slice left by the failed attempt is excluded from the
    anti-join read, so a replayed batch does not anti-join itself down to
    an empty overwrite (round-3 ADVICE high)."""
    import datetime as dt

    from fineweb_legal_spark.streaming.registry_stream import _commit_batch

    base = DATA_DIR / "tmp" / "stream_reg_replay"
    shutil.rmtree(base, ignore_errors=True)
    out, reg = str(base / "out"), str(base / "reg")
    schema = (
        "conv_id string, turn_idx int, ts timestamp, lang string, "
        "ppl_bucket int, scrubbed_text string, norm_key string, "
        "reason0 string"
    )
    ts = dt.datetime(2025, 6, 1)
    fn = _commit_batch(out, reg, 0)

    b0 = spark.createDataFrame(
        [
            ("c1", 0, ts, "en", 3, "hello", "k1", None),
            ("c2", 0, ts, "en", 3, "hello", "k1", None),  # within-batch dup
            ("c3", 0, ts, "en", 3, "other", "k2", None),
        ],
        schema,
    )
    fn(b0, 0)
    first = spark.read.parquet(f"{out}/batch=0").toPandas()
    assert set(first.conv_id) == {"c1", "c3"}
    # replay the SAME batch (foreachBatch is at-least-once)
    fn(b0, 0)
    replay = spark.read.parquet(f"{out}/batch=0").toPandas()
    assert set(replay.conv_id) == {"c1", "c3"}
    # a LATER batch still anti-joins every earlier slice
    b1 = spark.createDataFrame(
        [
            ("c4", 0, ts, "en", 3, "hello", "k1", None),  # cross-batch dup
            ("c5", 0, ts, "en", 3, "new", "k3", None),
        ],
        schema,
    )
    fn(b1, 1)
    second = spark.read.parquet(f"{out}/batch=1").toPandas()
    assert set(second.conv_id) == {"c5"}
    shutil.rmtree(base, ignore_errors=True)


def test_registry_stream_new_run_keeps_old_registry(spark):
    """A NEW run over the SAME registry (fresh checkpoint, batch ids
    restarting at 0) must neither overwrite old slices nor re-emit their
    keys: the run-base sidecar maps the new run's batches past every
    committed slice, preserving the never-forgetting contract."""
    import datetime as dt

    from fineweb_legal_spark.streaming.registry_stream import (
        _commit_batch,
        _pin_run_base,
    )

    base = DATA_DIR / "tmp" / "stream_reg_rerun"
    shutil.rmtree(base, ignore_errors=True)
    out, reg = str(base / "out"), str(base / "reg")
    cp1, cp2 = str(base / "cp1"), str(base / "cp2")
    schema = (
        "conv_id string, turn_idx int, ts timestamp, lang string, "
        "ppl_bucket int, scrubbed_text string, norm_key string, "
        "reason0 string"
    )
    ts = dt.datetime(2025, 6, 1)

    # run 1 (fresh everything): base 0, commits slices 0 and 1
    base1 = _pin_run_base(cp1, reg)
    assert base1 == 0
    fn1 = _commit_batch(out, reg, base1)
    fn1(
        spark.createDataFrame([("r1", 0, ts, "en", 3, "a", "k1", None)], schema),
        0,
    )
    fn1(
        spark.createDataFrame([("r2", 0, ts, "en", 3, "b", "k2", None)], schema),
        1,
    )

    # run 2: fresh checkpoint, same registry -> base jumps past slice 1,
    # and is STABLE on re-read (replay within run 2 reuses it)
    base2 = _pin_run_base(cp2, reg)
    assert base2 == 2
    assert _pin_run_base(cp2, reg) == 2
    fn2 = _commit_batch(out, reg, base2)
    fn2(
        spark.createDataFrame(
            [
                ("r3", 0, ts, "en", 3, "a", "k1", None),  # dup from run 1
                ("r4", 0, ts, "en", 3, "c", "k3", None),
            ],
            schema,
        ),
        0,
    )
    # run 1's slice 0 output is untouched; run 2's batch 0 landed at
    # slice 2 and dropped run 1's key
    got0 = spark.read.parquet(f"{out}/batch=0").toPandas()
    assert set(got0.conv_id) == {"r1"}
    got2 = spark.read.parquet(f"{out}/batch=2").toPandas()
    assert set(got2.conv_id) == {"r4"}
    allout = spark.read.parquet(f"{out}/batch=*").toPandas()
    assert set(allout.conv_id) == {"r1", "r2", "r4"}
    shutil.rmtree(base, ignore_errors=True)


def test_registry_compaction_preserves_dedup(spark):
    """compact_registry folds committed slices into one base file; dedup
    semantics, replay safety (keep_last), and a later fresh-checkpoint
    run's base pin must all survive the compaction."""
    import datetime as dt

    from fineweb_legal_spark.streaming.registry_stream import (
        _commit_batch,
        _pin_run_base,
        compact_registry,
    )

    base = DATA_DIR / "tmp" / "stream_reg_compact"
    shutil.rmtree(base, ignore_errors=True)
    out, reg = str(base / "out"), str(base / "reg")
    schema = (
        "conv_id string, turn_idx int, ts timestamp, lang string, "
        "ppl_bucket int, scrubbed_text string, norm_key string, "
        "reason0 string"
    )
    ts = dt.datetime(2025, 6, 1)
    fn = _commit_batch(out, reg, 0)
    for i, key in enumerate(["k1", "k2", "k3", "k4"]):
        fn(
            spark.createDataFrame(
                [(f"c{i}", 0, ts, "en", 3, f"t{i}", key, None)], schema
            ),
            i,
        )
    from pathlib import Path as P

    assert len(list(P(reg).glob("batch-*.parquet"))) == 4
    removed = compact_registry(spark, reg, keep_last=1)
    assert removed == 3
    assert [p.name for p in sorted(P(reg).glob("base-*.parquet"))] == [
        "base-2.parquet"
    ]
    assert [p.name for p in sorted(P(reg).glob("batch-*.parquet"))] == [
        "batch-3.parquet"
    ]

    # dedup against compacted keys still holds (k1 lives in the base now)
    fn(
        spark.createDataFrame(
            [
                ("c9", 0, ts, "en", 3, "dup", "k1", None),
                ("c10", 0, ts, "en", 3, "new", "k5", None),
            ],
            schema,
        ),
        4,
    )
    got = spark.read.parquet(f"{out}/batch=4").toPandas()
    assert set(got.conv_id) == {"c10"}

    # re-running compaction converges (idempotent semantics)
    compact_registry(spark, reg, keep_last=1)
    allfiles = sorted(
        p.name for p in list(P(reg).glob("ba*-*.parquet"))
    )
    assert allfiles == ["base-3.parquet", "batch-4.parquet"]

    # a fresh-checkpoint run over the fully-compacted registry pins past
    # every id the base covers
    cp2 = str(base / "cp2")
    assert _pin_run_base(cp2, reg) == 5
    shutil.rmtree(base, ignore_errors=True)


def test_registry_compaction_never_unpublishes_live_base(spark):
    """Re-compacting when base-<upto> already exists (crashed prior
    compaction, or a straggler slice with sid < the base's) publishes a
    NEW generation name instead of rmtree-ing the only live copy of the
    base's keys, and preserves the key union."""
    import datetime as dt

    from fineweb_legal_spark.streaming.registry_stream import (
        _commit_batch,
        _registry_files,
        compact_registry,
    )

    base = DATA_DIR / "tmp" / "stream_reg_compact_gen"
    shutil.rmtree(base, ignore_errors=True)
    out, reg = str(base / "out"), str(base / "reg")
    schema = (
        "conv_id string, turn_idx int, ts timestamp, lang string, "
        "ppl_bucket int, scrubbed_text string, norm_key string, "
        "reason0 string"
    )
    ts = dt.datetime(2025, 6, 1)
    fn = _commit_batch(out, reg, 0)
    for i, key in enumerate(["k1", "k2", "k3"]):
        fn(
            spark.createDataFrame(
                [(f"c{i}", 0, ts, "en", 3, f"t{i}", key, None)], schema
            ),
            i,
        )
    from pathlib import Path as P

    # first compaction: base-2 holds k1..k3 (all three slices folded)
    assert compact_registry(spark, reg, keep_last=0) == 3
    assert [p.name for p in sorted(P(reg).glob("base-*.parquet"))] == [
        "base-2.parquet"
    ]
    # straggler slice with sid < the live base's id -> upto collides
    fn2 = _commit_batch(out, reg, 0)  # run_base 0 -> slice id 1
    fn2(
        spark.createDataFrame(
            [("cx", 0, ts, "en", 3, "tx", "k9", None)], schema
        ),
        1,
    )
    assert compact_registry(spark, reg, keep_last=0) == 2
    names = [p.name for p in _registry_files(reg)]
    assert names == ["base-2.g2.parquet"], names
    keys = {
        r.norm_key
        for r in spark.read.parquet(
            *[str(p) for p in _registry_files(reg)]
        ).collect()
    }
    assert keys == {"k1", "k2", "k3", "k9"}


def test_registry_stream_bloom_path_identical(spark):
    """The Bloom-accelerated registry dedup must commit the IDENTICAL
    kept set and registry as the plain path — across within-batch dups,
    cross-batch dups, replay, and the incremental filter growth."""
    import datetime as dt

    from fineweb_legal_spark.streaming.registry_stream import _commit_batch

    base = DATA_DIR / "tmp" / "stream_reg_bloom"
    shutil.rmtree(base, ignore_errors=True)
    ts = dt.datetime(2025, 6, 1)
    schema = (
        "conv_id string, turn_idx int, ts timestamp, lang string, "
        "ppl_bucket int, scrubbed_text string, norm_key string, "
        "reason0 string"
    )
    b0 = spark.createDataFrame(
        [
            ("c1", 0, ts, "en", 3, "hello", "k1", None),
            ("c2", 0, ts, "en", 3, "hello", "k1", None),  # within-batch dup
            ("c3", 0, ts, "en", 3, "other", "k2", None),
            ("cX", 0, ts, "en", 3, "reject", "k9", "lang"),
        ],
        schema,
    )
    b1 = spark.createDataFrame(
        [
            ("c4", 0, ts, "en", 3, "hello", "k1", None),  # cross-batch dup
            ("c5", 0, ts, "en", 3, "new", "k3", None),
            ("c6", 1, ts, "en", 3, "other", "k2", None),  # cross-batch dup
        ],
        schema,
    )

    results = {}
    for mode, bloom_state in (("plain", None), ("bloom", {"fpp": 0.01, "expected": 1000})):
        out = str(base / mode / "out")
        reg = str(base / mode / "reg")
        fn = _commit_batch(out, reg, 0, bloom_state)
        fn(b0, 0)
        fn(b0, 0)  # replay must stay idempotent with the filter grown
        fn(b1, 1)
        kept0 = sorted(spark.read.parquet(f"{out}/batch=0").toPandas().conv_id)
        kept1 = sorted(spark.read.parquet(f"{out}/batch=1").toPandas().conv_id)
        regkeys = sorted(
            spark.read.parquet(f"{reg}/batch-0.parquet", f"{reg}/batch-1.parquet")
            .toPandas()
            .norm_key
        )
        results[mode] = (kept0, kept1, regkeys)
    assert results["plain"] == results["bloom"]
    assert results["bloom"][0] == ["c1", "c3"]
    assert results["bloom"][1] == ["c5"]
    shutil.rmtree(base, ignore_errors=True)
