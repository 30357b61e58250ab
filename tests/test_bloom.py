"""Bloom semi-join reduction: no false negatives ever, measured fpp near
target, and the prefiltered anti-join EXACTLY equals the plain anti-join
(including null-key rows)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fineweb_legal_spark.operators.bloom import (
    bloom_filtered_antijoin,
    bloom_might_contain,
    build_bloom,
    load_bloom,
    save_bloom,
)


def _keys(spark, lo, hi, prefix="k"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(prefix), F.col("id")).alias("key"), F.col("id")
    )


def test_no_false_negatives_and_fpp(spark):
    members = _keys(spark, 0, 20_000)
    bloom = build_bloom(members, "key", fpp=0.01)
    flagged = bloom_might_contain(members, "key", bloom, "might")
    assert flagged.filter(~F.col("might")).count() == 0  # never a false negative

    outside = _keys(spark, 1_000_000, 1_040_000)
    fp = bloom_might_contain(outside, "key", bloom, "might").filter("might").count()
    assert fp / 40_000 < 0.05  # target 0.01; generous noise margin


def test_prefiltered_antijoin_matches_plain(spark):
    # overlap + novel + null keys: every case the plain anti-join decides
    registry = _keys(spark, 0, 5_000)
    new = (
        _keys(spark, 2_500, 9_000)
        .unionByName(
            spark.range(3).select(
                F.lit(None).cast("string").alias("key"), (F.col("id") + 100_000).alias("id")
            )
        )
    )
    got = bloom_filtered_antijoin(new, registry, "key", fpp=0.01)
    want = new.join(registry.select("key"), "key", "left_anti")
    g = sorted(((r.key or "", r.id) for r in got.collect()))
    w = sorted(((r.key or "", r.id) for r in want.collect()))
    assert g == w
    # null-key rows survive (cannot equal any registry key)
    assert sum(1 for k, _ in g if k == "") == 3


def test_artifact_roundtrip(spark, tmp_path):
    members = _keys(spark, 0, 1_000)
    bloom = build_bloom(members, "key", fpp=0.01)
    path = str(tmp_path / "bloom")
    save_bloom(spark, bloom, path)
    loaded = load_bloom(spark, path)
    assert loaded.n_bits == bloom.n_bits and loaded.k == bloom.k
    assert (loaded.bitmap == bloom.bitmap).all()
    flagged = bloom_might_contain(members, "key", loaded, "might")
    assert flagged.filter(~F.col("might")).count() == 0


def test_bad_fpp_raises(spark):
    with pytest.raises(ValueError, match="fpp"):
        build_bloom(_keys(spark, 0, 10), "key", fpp=1.5)


def test_survivors_broadcast_matches_and_no_registry_exchange(spark):
    """The reversed-semi-join mode must give the identical row set AND
    never shuffle a join side: both joins broadcast (the registry is
    only scanned; the remaining Exchanges are the survivor-key distinct
    aggregates, bounded by the post-bloom survivor count)."""
    from fineweb_legal_spark.session import explain_formatted as _plan

    registry = _keys(spark, 0, 5_000)
    new = _keys(spark, 2_500, 9_000)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        got = bloom_filtered_antijoin(
            new, registry, "key", fpp=0.01, survivors_broadcast=True
        )
        plan = _plan(got)
        assert "SortMergeJoin" not in plan, plan
        assert "ShuffledHashJoin" not in plan, plan
        assert plan.count("BroadcastHashJoin") >= 2, plan
        want = new.join(registry.select("key"), "key", "left_anti")
        assert sorted(r.key for r in got.collect()) == sorted(
            r.key for r in want.collect()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_incremental_add_hashes(spark):
    """A filter grown batch-by-batch with add_hashes must never produce a
    false negative for any added key, and saturation must track load."""
    import numpy as np

    members = _keys(spark, 0, 2_000)
    bloom = build_bloom(members, "key", expected=10_000, fpp=0.01)
    s0 = bloom.saturation()
    batch = _keys(spark, 50_000, 52_000, prefix="n")
    hashes = np.array(
        [r.h for r in batch.select(F.xxhash64("key").alias("h")).collect()],
        dtype=np.int64,
    )
    bloom.add_hashes(hashes)
    assert bloom.saturation() > s0
    flagged = bloom_might_contain(batch, "key", bloom, "might")
    assert flagged.filter(~F.col("might")).count() == 0
    # idempotent: re-adding changes nothing
    before = bloom.bitmap.copy()
    bloom.add_hashes(hashes)
    assert (bloom.bitmap == before).all()
