"""TableIO — the Iceberg-or-session-catalog writer (sources/catalog.py).

The V2 (Iceberg) branch can't run here (no Iceberg jar in the sandbox),
so these tests pin (a) the routing decision itself — a registered
``spark.sql.catalog.<name>`` conf flips the table to V2 writes — and
(b) the complete V1 fallback semantics: positional-write protection,
atomic-ish append, and the idempotent per-partition overwrite that the
north rule's resumable commits build on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fineweb_legal_spark.sources.catalog import (
    TableIO,
    catalog_of,
    supports_v2_writes,
)


@pytest.fixture()
def tio(spark):
    return TableIO(spark)


def _mk(spark, n=10, part_expr="id % 2"):
    return spark.range(n).withColumn(
        "part", F.expr(part_expr).cast("int")
    ).withColumn("payload", F.concat(F.lit("v"), F.col("id")))


def test_v2_detection_from_catalog_conf(spark):
    # stock session catalog: no plugged V2 catalog anywhere
    assert catalog_of(spark, "plain_table") == "spark_catalog"
    assert not supports_v2_writes(spark, "plain_table")
    assert not supports_v2_writes(spark, "db.plain_table")
    # a registered catalog conf (how Iceberg announces itself) flips
    # names qualified with that catalog — and ONLY those — to V2
    spark.conf.set("spark.sql.catalog.lake", "org.example.FakeV2Catalog")
    try:
        assert catalog_of(spark, "lake.db.t") == "lake"
        assert supports_v2_writes(spark, "lake.db.t")
        assert not supports_v2_writes(spark, "plain_table")
    finally:
        spark.conf.unset("spark.sql.catalog.lake")


def test_create_append_roundtrip(spark, tio):
    spark.sql("DROP TABLE IF EXISTS cat_rt")
    try:
        df = _mk(spark)
        tio.create(df, "cat_rt", partition_by=["part"])
        assert spark.table("cat_rt").count() == 10
        # append realigns a column-permuted frame (insertInto is
        # positional; unaligned this would write payload into part)
        extra = _mk(spark, 4, part_expr="0").select("payload", "part", "id")
        tio.append(extra, "cat_rt")
        t = spark.table("cat_rt")
        assert t.count() == 14
        assert t.filter("part = 0").count() == 9
        assert t.filter(t.payload == "v0").count() == 2  # both v0 rows intact
    finally:
        spark.sql("DROP TABLE IF EXISTS cat_rt")


def test_append_rejects_column_set_mismatch(spark, tio):
    spark.sql("DROP TABLE IF EXISTS cat_mismatch")
    try:
        tio.create(_mk(spark), "cat_mismatch", partition_by=["part"])
        bad = _mk(spark).withColumnRenamed("payload", "pay1oad")
        with pytest.raises(ValueError, match="missing=.*payload.*extra=.*pay1oad"):
            tio.append(bad, "cat_mismatch")
        # nothing was written by the failed call
        assert spark.table("cat_mismatch").count() == 10
    finally:
        spark.sql("DROP TABLE IF EXISTS cat_mismatch")


def test_overwrite_partitions_is_surgical_and_idempotent(spark, tio):
    spark.sql("DROP TABLE IF EXISTS cat_ow")
    try:
        tio.create(_mk(spark, 10), "cat_ow", partition_by=["part"])  # 5 + 5
        # recommit partition 0 with different content
        redo = (
            spark.range(100, 103)
            .withColumn("part", F.lit(0).cast("int"))
            .withColumn("payload", F.lit("redo"))
        )
        tio.overwrite_partitions(redo, "cat_ow")
        t = spark.table("cat_ow")
        # partition 0 replaced wholesale, partition 1 untouched
        assert t.filter("part = 0").count() == 3
        assert t.filter("part = 1").count() == 5
        assert t.filter((t.part == 0) & (t.payload != "redo")).count() == 0
        # replaying the SAME commit converges (kill/rerun idempotence)
        tio.overwrite_partitions(redo, "cat_ow")
        assert spark.table("cat_ow").count() == 8
        # the session conf was restored after the write
        assert (
            spark.conf.get("spark.sql.sources.partitionOverwriteMode")
            != "dynamic"
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS cat_ow")


def test_overwrite_mode_conf_restored_on_failure(spark, tio):
    """The dynamic-overwrite session conf must be restored even when the
    write itself fails (here: column-set mismatch surfaces before any
    conf flip; a type error surfaces during it)."""
    spark.sql("DROP TABLE IF EXISTS cat_fail")
    try:
        tio.create(_mk(spark), "cat_fail", partition_by=["part"])
        before = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        bad = _mk(spark).drop("payload")
        with pytest.raises(ValueError):
            tio.overwrite_partitions(bad, "cat_fail")
        assert (
            spark.conf.get("spark.sql.sources.partitionOverwriteMode")
            == before
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS cat_fail")


def test_ensure_creates_once(spark, tio):
    spark.sql("DROP TABLE IF EXISTS cat_ens")
    try:
        df = _mk(spark, 6)
        assert tio.ensure(df, "cat_ens", partition_by=["part"]) is True
        assert tio.ensure(df, "cat_ens", partition_by=["part"]) is False
        assert spark.table("cat_ens").count() == 6  # second call wrote nothing
    finally:
        spark.sql("DROP TABLE IF EXISTS cat_ens")
