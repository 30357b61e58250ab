"""Attribute store (Dolma-style tag-once / filter-many): re-filters from
persisted attributes must equal inline filters, sets must compose without
collisions, untagged rows must drop by default, and the bucketed layout
must re-join with zero Exchange."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fineweb_legal_spark.operators.attributes import (
    filter_by_attributes,
    join_attributes,
    namespace_attributes,
    read_attribute_set,
    tag_attributes,
    write_attribute_set,
)
from fineweb_legal_spark.session import explain_formatted as _plan

KEYS = ("doc_id",)


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _shape_taggers():
    words = F.size(F.split(F.trim(F.coalesce("text", F.lit(""))), r"\s+"))
    return {
        "chars": F.length(F.coalesce("text", F.lit(""))).cast("long"),
        "words": words.cast("long"),
        "upper_frac": (
            F.length(F.regexp_replace(F.coalesce("text", F.lit("")), "[^A-Z]", ""))
            / F.greatest(F.length(F.coalesce("text", F.lit(""))), F.lit(1))
        ),
    }


def test_refilter_matches_inline_and_reuses_tags(spark, tmp_path):
    """Write attributes once; two different thresholds re-filtered from
    the store must equal the corresponding inline filters, with the
    document schema preserved."""
    docs = _docs(spark)
    attrs = tag_attributes(docs, "shape", _shape_taggers(), KEYS)
    path = str(tmp_path / "attr_shape")
    write_attribute_set(attrs, path)
    stored = read_attribute_set(spark, path)

    for lo, hi in ((20, 2000), (50, 400)):
        pred = (F.col("shape__words") >= lo) & (F.col("shape__chars") <= hi)
        got = filter_by_attributes(docs, [stored], pred, KEYS)
        assert got.columns == docs.columns
        words = F.size(F.split(F.trim(F.coalesce("text", F.lit(""))), r"\s+"))
        want = docs.filter(
            (words >= lo) & (F.length(F.coalesce("text", F.lit(""))) <= hi)
        )
        got_ids = sorted(r.doc_id for r in got.select("doc_id").collect())
        want_ids = sorted(r.doc_id for r in want.select("doc_id").collect())
        assert got_ids == want_ids and len(got_ids) > 0


def test_sets_compose_and_collisions_raise(spark):
    docs = _docs(spark)
    shape = tag_attributes(docs, "shape", _shape_taggers(), KEYS)
    langset = namespace_attributes(
        docs.select("doc_id", F.col("lang").alias("pred_lang")), "lid", KEYS
    )
    assert langset.columns == ["doc_id", "lid__pred_lang"]

    joined = join_attributes(docs, [shape, langset], KEYS)
    assert "shape__words" in joined.columns and "lid__pred_lang" in joined.columns

    pred = (F.col("shape__words") >= 10) & (F.col("lid__pred_lang") == "en")
    got = filter_by_attributes(docs, [shape, langset], pred, KEYS)
    words = F.size(F.split(F.trim(F.coalesce("text", F.lit(""))), r"\s+"))
    want = docs.filter((words >= 10) & (F.col("lang") == "en")).count()
    assert got.count() == want

    # an un-namespaced set colliding with a document column must raise,
    # not silently shadow
    with pytest.raises(ValueError, match="collide"):
        join_attributes(docs, [docs.select("doc_id", "lang")], KEYS)
    # namespace separator reserved in set names
    with pytest.raises(ValueError, match="separator"):
        tag_attributes(docs, "a__b", _shape_taggers(), KEYS)


def test_untagged_rows_drop_by_default(spark):
    """Documents with no attribute row are nulls after the left join; the
    predicate must treat them as drop unless keep_untagged=True."""
    docs = _docs(spark)
    partial = tag_attributes(
        docs.filter(F.col("doc_id") % 2 == 0), "shape", _shape_taggers(), KEYS
    )
    pred = F.col("shape__chars") >= 0  # true wherever tagged
    kept = filter_by_attributes(docs, [partial], pred, KEYS)
    assert kept.filter(F.col("doc_id") % 2 == 1).count() == 0
    kept_all = filter_by_attributes(docs, [partial], pred, KEYS, keep_untagged=True)
    assert kept_all.count() == docs.count()


def test_bucketed_attribute_join_zero_exchange(spark):
    """Docs and attribute set bucketed identically on the key: the
    re-filter join must plan as a sort-merge join with NO Exchange on
    either side — N re-filters after one bucket write pay zero join
    shuffles."""
    docs = _docs(spark)
    attrs = tag_attributes(docs, "shape", _shape_taggers(), KEYS)
    write_attribute_set(
        docs.select("doc_id", "text", "lang", "source"),
        "attr_docs_b",
        as_table=True,
        bucket_key="doc_id",
        n_buckets=8,
    )
    write_attribute_set(
        attrs, "attr_shape_b", as_table=True, bucket_key="doc_id", n_buckets=8
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        d = read_attribute_set(spark, "attr_docs_b", as_table=True)
        a = read_attribute_set(spark, "attr_shape_b", as_table=True)
        kept = filter_by_attributes(d, [a], F.col("shape__words") >= 10, KEYS)
        plan = _plan(kept)
        assert ") Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert kept.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS attr_docs_b")
        spark.sql("DROP TABLE IF EXISTS attr_shape_b")
