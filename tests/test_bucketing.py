"""Co-located bucketed join: the write-once-shuffle-never layout must plan
with zero Exchange on either join side (the whole point of paying the
bucket shuffle at write time)."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F


from fineweb_legal_spark.session import explain_formatted as _plan


def test_bucketed_join_has_no_exchange(spark):
    from fineweb_legal_spark.sources.bucketed import colocated_join, write_bucketed

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stats = docs.select(
        "doc_id", F.length("text").alias("chars"), F.size(F.split("text", r"\s+")).alias("words")
    )
    write_bucketed(docs.select("doc_id", "lang", "source"), "b_docs", "doc_id", 8)
    write_bucketed(stats, "b_stats", "doc_id", 8)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, "b_docs", "b_stats", "doc_id")
        plan = _plan(joined)
        assert ") Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and the result is right
        assert joined.count() == docs.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_stats")


def test_bucketed_dedup_zero_exchange_and_matches_classic(spark):
    """Staged dedup: window over the norm_key-bucketed scored table must
    plan with zero Exchange AND the WindowGroupLimit pushdown, and must
    keep exactly the classic min-(conv_id, turn_idx) winners plus every
    null-key reject."""
    from fineweb_legal_spark.sources.bucketed import (
        bucketed_dedup,
        write_scored_bucketed,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # Scored-shaped frame with forced duplicate keys (doc_id % 40 -> ~12
    # rows per key) and null keys standing in for rejects.
    scored = docs.select(
        F.col("doc_id").alias("conv_id"),
        (F.col("doc_id") % 3).alias("turn_idx"),
        F.when(
            F.col("doc_id") % 7 != 0, F.md5((F.col("doc_id") % 40).cast("string"))
        ).alias("norm_key"),
        "source",
    )
    write_scored_bucketed(scored, "b_scored", n_buckets=8)
    try:
        dd = bucketed_dedup(spark, "b_scored")
        plan = _plan(dd)
        assert ") Exchange" not in plan, plan
        assert "WindowGroupLimit" in plan, plan

        # Oracle: classic dedup on the unbucketed frame.
        import pandas as pd
        from pyspark.sql import Window

        w = Window.partitionBy("norm_key").orderBy("conv_id", "turn_idx")
        winners = (
            scored.filter(F.col("norm_key").isNotNull())
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("conv_id", "turn_idx")
        )
        rejects = scored.filter(F.col("norm_key").isNull()).select(
            "conv_id", "turn_idx"
        )
        want = (
            winners.unionByName(rejects)
            .toPandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        got = (
            dd.select("conv_id", "turn_idx")
            .toPandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        assert len(want) < scored.count()  # dups actually removed
        pd.testing.assert_frame_equal(got, want)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_scored")


def test_write_bucketed_recovers_from_orphan_location(spark):
    """A writer killed mid-write leaves the managed location on disk with
    no catalog entry; the next write must clean it up and succeed instead
    of dying with LOCATION_ALREADY_EXISTS."""
    import os

    from fineweb_legal_spark.sources.bucketed import write_bucketed

    spark.sql("DROP TABLE IF EXISTS b_orphan")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    orphan = os.path.join(warehouse, "b_orphan")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "part-stale.parquet"), "w") as f:
        f.write("stale")
    try:
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        write_bucketed(docs.select("doc_id", "source"), "b_orphan", "doc_id", 4)
        assert spark.table("b_orphan").count() == docs.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orphan")


def test_bucketed_incremental_dedup_zero_exchange(spark):
    """New-slice dedup against the staged base: zero Exchange anywhere in
    the plan (the base is never re-shuffled), and the result is exactly
    intra-slice winners whose key is absent from the base."""
    from fineweb_legal_spark.sources.bucketed import (
        bucketed_incremental_dedup,
        write_scored_bucketed,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    key_of = F.md5((F.col("doc_id") % 60).cast("string"))
    base = docs.filter(F.col("doc_id") < 300).select(
        F.col("doc_id").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        key_of.alias("norm_key"),
    )
    # slice overlaps the base's key space (doc_id % 60) and carries its
    # own internal dups plus null-key rejects
    slc = docs.filter(F.col("doc_id") >= 250).select(
        F.col("doc_id").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.when(F.col("doc_id") % 5 != 0, key_of).alias("norm_key"),
    )
    write_scored_bucketed(base, "b_base", n_buckets=8)
    write_scored_bucketed(slc, "b_slice", n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        inc = bucketed_incremental_dedup(spark, "b_base", "b_slice")
        plan = _plan(inc)
        assert ") Exchange" not in plan, plan
        assert "SortMergeJoin" in plan and "LeftAnti" in plan, plan

        # oracle: slice winners (non-null keys only; nulls became unique
        # synthetic keys at write) minus every base key
        from pyspark.sql import Window

        w = Window.partitionBy("norm_key").orderBy("conv_id", "turn_idx")
        slice_winners = (
            slc.filter(F.col("norm_key").isNotNull())
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        survivors = slice_winners.join(
            base.select("norm_key").distinct(), "norm_key", "left_anti"
        )
        rejects = slc.filter(F.col("norm_key").isNull())
        want = sorted(
            (r.conv_id, r.turn_idx)
            for r in survivors.unionByName(rejects).collect()
        )
        got = sorted((r.conv_id, r.turn_idx) for r in inc.collect())
        assert want == got
        assert len(got) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_base")
        spark.sql("DROP TABLE IF EXISTS b_slice")


def test_scored_bucketed_reject_keys_do_not_collide(spark):
    """Synthetic reject keys are '#'-separated: ("c1",23) and ("c12",3)
    must stay distinct singleton keys (bare concatenation collided and
    silently dropped one reject in the dedup window)."""
    from fineweb_legal_spark.sources.bucketed import (
        bucketed_dedup,
        write_scored_bucketed,
    )

    rows = spark.createDataFrame(
        [("c1", 23, None), ("c12", 3, None)],
        "conv_id string, turn_idx int, norm_key string",
    )
    write_scored_bucketed(rows, "b_rejects", n_buckets=4)
    try:
        keys = [
            r.norm_key for r in spark.table("b_rejects").collect()
        ]
        assert len(set(keys)) == 2, keys
        assert bucketed_dedup(spark, "b_rejects").count() == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS b_rejects")


def test_orphan_cleanup_is_database_scoped(spark):
    """With the session in a non-default database, write_bucketed must
    NOT delete the default database's live table data (the orphan check
    consults the current database, so the path must too)."""
    from fineweb_legal_spark.sources.bucketed import write_bucketed

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source")
    spark.sql("DROP TABLE IF EXISTS b_scoped")
    spark.sql("CREATE DATABASE IF NOT EXISTS b_scratch")
    try:
        write_bucketed(docs, "b_scoped", key="doc_id", n_buckets=4)
        n = spark.table("b_scoped").count()
        spark.catalog.setCurrentDatabase("b_scratch")
        write_bucketed(docs, "b_scoped", key="doc_id", n_buckets=4)
        spark.catalog.setCurrentDatabase("default")
        # the default-db table's data survived the scratch-db write
        assert spark.table("b_scoped").count() == n
        assert (
            spark.table("b_scratch.b_scoped").count() == docs.count()
        )
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql("DROP TABLE IF EXISTS b_scoped")
        spark.sql("DROP TABLE IF EXISTS b_scratch.b_scoped")
        spark.sql("DROP DATABASE IF EXISTS b_scratch")


def test_scored_bucketed_null_coordinates_stay_distinct(spark):
    """Rejects with NULL order coordinates still get non-null, distinct
    synthetic keys (concat null-propagation would have merged them into
    one NULL window partition and dropped all but one)."""
    from fineweb_legal_spark.sources.bucketed import (
        bucketed_dedup,
        write_scored_bucketed,
    )

    rows = spark.createDataFrame(
        [(None, 1, None), (None, 2, None), ("c", None, None)],
        "conv_id string, turn_idx int, norm_key string",
    )
    write_scored_bucketed(rows, "b_nullcoord", n_buckets=4)
    try:
        keys = [r.norm_key for r in spark.table("b_nullcoord").collect()]
        assert all(k is not None for k in keys)
        assert len(set(keys)) == 3, keys
        assert bucketed_dedup(spark, "b_nullcoord").count() == 3
    finally:
        spark.sql("DROP TABLE IF EXISTS b_nullcoord")


def test_orphan_cleanup_custom_location_database(spark):
    """Orphan recovery asks the catalog for the database location, so a
    CREATE DATABASE ... LOCATION db also unblocks after a crashed write."""
    import shutil
    from pathlib import Path

    from fineweb_legal_spark.datasets import DATA_DIR
    from fineweb_legal_spark.sources.bucketed import write_bucketed

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source")
    loc = DATA_DIR / "tmp" / "customdb"
    shutil.rmtree(loc, ignore_errors=True)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS b_custom LOCATION '{loc}'")
    try:
        spark.catalog.setCurrentDatabase("b_custom")
        # orphan: location exists, no catalog entry (crashed writer)
        (loc / "b_orphloc").mkdir(parents=True, exist_ok=True)
        (loc / "b_orphloc" / "junk").write_text("x")
        write_bucketed(docs, "b_orphloc", key="doc_id", n_buckets=4)
        assert spark.table("b_orphloc").count() == docs.count()
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql("DROP TABLE IF EXISTS b_custom.b_orphloc")
        spark.sql("DROP DATABASE IF EXISTS b_custom")
        shutil.rmtree(loc, ignore_errors=True)


def _job_args(**kw):
    import argparse

    d = dict(table="sjl_base", mode="init", input=None, output=None,
             buckets=4, master=None, warehouse=None)
    d.update(kw)
    return argparse.Namespace(**d)


def test_staged_dedup_lifecycle_in_process(spark):
    """run(): multi-slice anti-join (a key committed by slice 1 blocks
    slice 2), compaction folds the family via rename-swap, and recovery
    promotes a stranded generation."""
    import importlib.util

    import pandas as pd

    from fineweb_legal_spark.datasets import DATA_DIR

    spec = importlib.util.spec_from_file_location(
        "run_staged_dedup", "/root/repo/jobs/run_staged_dedup.py"
    )
    job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(job)

    base = DATA_DIR / "tmp" / "staged_inproc"
    shutil.rmtree(base, ignore_errors=True)
    base.mkdir(parents=True)
    pd.DataFrame({"conv_id": ["a", "b"], "turn_idx": [0, 0],
                  "norm_key": ["k1", "k2"]}).to_parquet(base / "i.parquet")
    pd.DataFrame({"conv_id": ["c", "d"], "turn_idx": [0, 0],
                  "norm_key": ["k2", "k9"]}).to_parquet(base / "s1.parquet")
    # k9 must be blocked by SLICE 1's commit, not the base; k5 is new
    pd.DataFrame({"conv_id": ["e", "f"], "turn_idx": [0, 0],
                  "norm_key": ["k9", "k5"]}).to_parquet(base / "s2.parquet")

    for t in ("sjl_base", "sjl_base__s1", "sjl_base__s2",
              "sjl_base__staging", "sjl_base__gen2", "sjl_base__old2"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        out = job.run(spark, _job_args(mode="init", input=str(base / "i.parquet")))
        assert out["rows"] == 2
        out = job.run(spark, _job_args(mode="append", input=str(base / "s1.parquet")))
        assert out["slice"] == "sjl_base__s1" and out["survivors"] == 1  # k9
        out = job.run(spark, _job_args(mode="append", input=str(base / "s2.parquet")))
        assert out["slice"] == "sjl_base__s2" and out["survivors"] == 1  # k5 only
        assert out["family_rows"] == 4
        out = job.run(spark, _job_args(mode="compact"))
        assert out == {"mode": "compact", "table": "sjl_base",
                       "folded": 2, "rows": 4}
        keys = {r.norm_key for r in spark.table("sjl_base").collect()}
        assert keys == {"k1", "k2", "k9", "k5"}
        assert not spark.catalog.tableExists("sjl_base__s1")

        # crash recovery: strand the base as a generation (the state after
        # "gen written + old renamed aside, live rename not reached")
        spark.sql("ALTER TABLE sjl_base RENAME TO sjl_base__gen7")
        out = job.run(spark, _job_args(mode="compact"))  # triggers _recover
        assert spark.catalog.tableExists("sjl_base")
        assert out["folded"] == 0
        assert spark.table("sjl_base").count() == 4
    finally:
        for t in ("sjl_base", "sjl_base__s1", "sjl_base__s2",
                  "sjl_base__staging", "sjl_base__gen2", "sjl_base__gen7",
                  "sjl_base__old2"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(base, ignore_errors=True)


def test_staged_dedup_job_cross_run(spark):
    """The spark-submit launcher across two real processes: the persistent
    catalog carries the base family between runs."""
    import json
    import subprocess
    import sys

    import pandas as pd

    from fineweb_legal_spark.datasets import DATA_DIR

    base = DATA_DIR / "tmp" / "staged_job"
    shutil.rmtree(base, ignore_errors=True)
    base.mkdir(parents=True)
    pd.DataFrame(
        {"conv_id": ["a", "b", "c"], "turn_idx": [0, 0, 0],
         "norm_key": ["k1", "k2", None]}
    ).to_parquet(base / "init.parquet")
    # slice: k2 duplicates the base; k9 new twice (intra-slice dup); a reject
    pd.DataFrame(
        {"conv_id": ["d", "e", "f", "g"], "turn_idx": [0, 0, 0, 0],
         "norm_key": ["k2", "k9", "k9", None]}
    ).to_parquet(base / "slice.parquet")

    def run(*args):
        p = subprocess.run(
            [sys.executable, "jobs/run_staged_dedup.py",
             "--warehouse", str(base / "wh"), "--master", "local[4]", *args],
            capture_output=True, text=True, timeout=420, cwd="/root/repo",
        )
        assert p.returncode == 0, p.stderr[-800:]
        return json.loads(p.stdout.strip().splitlines()[-1])

    try:
        out = run("--table", "sj_base", "--mode", "init",
                  "--input", str(base / "init.parquet"), "--buckets", "4")
        assert out == {"mode": "init", "table": "sj_base", "rows": 3}
        out = run("--table", "sj_base", "--mode", "append",
                  "--input", str(base / "slice.parquet"),
                  "--output", str(base / "survivors"))
        # survivors: e (k9 winner = min conv_id) + reject g
        assert out["survivors"] == 2
        assert out["family_rows"] == 5
        surv = {r.conv_id for r in
                spark.read.parquet(str(base / "survivors")).collect()}
        assert surv == {"e", "g"}
    finally:
        shutil.rmtree(base, ignore_errors=True)
