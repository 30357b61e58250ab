"""Corpus diff: added/removed/changed/unchanged classification, group
attribution sides, null-text sentinel, and the summary's totals."""

from __future__ import annotations

import pyspark.sql.functions as F

from fineweb_legal_spark.operators.diff import corpus_diff, corpus_diff_summary


def _v(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_statuses_and_group_sides(spark):
    old = _v(
        spark,
        [
            (1, "same", "a"),
            (2, "before", "a"),
            (3, "gone", "b"),
            (5, None, "b"),
        ],
    )
    new = _v(
        spark,
        [
            (1, "same", "a"),
            (2, "after", "a"),
            (4, "fresh", "b"),
            (5, "", "b"),  # null -> '' must count as changed
        ],
    )
    d = {r.doc_id: r for r in corpus_diff(old, new, group_cols=["source"]).collect()}
    assert d[1].status == "unchanged"
    assert d[2].status == "changed"
    assert d[3].status == "removed" and d[3].source == "b"  # old-side group
    assert d[4].status == "added" and d[4].source == "b"
    assert d[5].status == "changed"

    s = corpus_diff_summary(old, new, group_cols=["source"]).collect()
    by = {(r.source, r.status): r for r in s}
    assert by[("a", "unchanged")].n_docs == 1
    assert by[("a", "changed")].n_docs == 1
    assert by[("b", "removed")].n_docs == 1
    assert by[("b", "added")].n_docs == 1
    assert by[("b", "changed")].n_docs == 1
    # totals: old side of b = {3,5}; new side of b = {4,5}
    assert by[("b", "added")].old_total == 2
    assert by[("b", "added")].new_total == 2


def test_diff_on_real_docs_roundtrip(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # new version: drop every 7th doc, mutate every 5th, add 10
    old = docs
    new = (
        docs.filter(F.col("doc_id") % 7 != 0)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text")),
        )
        .unionByName(
            spark.range(10_000, 10_010).select(
                F.col("id").alias("doc_id"),
                F.lit("brand new").alias("text"),
                F.lit("x").alias("lang"),
                F.lit("web").alias("source"),
                F.lit(9).alias("n_chars"),
            )
        )
    )
    d = corpus_diff(old, new)
    counts = {r.status: r.n for r in d.groupBy("status").agg(F.count("*").alias("n")).collect()}
    n = old.count()
    removed = old.filter(F.col("doc_id") % 7 == 0).count()
    changed = old.filter((F.col("doc_id") % 7 != 0) & (F.col("doc_id") % 5 == 0)).count()
    assert counts["removed"] == removed
    assert counts["added"] == 10
    assert counts["changed"] == changed
    assert counts["unchanged"] == n - removed - changed


def test_diff_duckdb_oracle_parity(spark):
    """The full diff verdict frame must match an independent DuckDB
    restatement (full-outer join + CASE over md5 digests) row for row —
    the same rigor as the driver's oracle gate, applied in-suite because
    the 50-entry registry is budget-capped."""
    import duckdb

    path = "/root/testdata/sf0.001/documents.parquet"
    docs = spark.read.parquet(path)
    new = docs.filter((F.col("doc_id") % 3 != 0)).withColumn(
        "text",
        F.when(F.col("doc_id") % 4 == 0, F.lit(None).cast("string")).otherwise(
            F.col("text")
        ),
    )
    got = sorted(
        (r.doc_id, r.status, r.source)
        for r in corpus_diff(docs, new, group_cols=["source"]).collect()
    )
    con = duckdb.connect()
    want = sorted(
        tuple(t)
        for t in con.sql(
            f"""
        WITH o AS (SELECT doc_id, md5(coalesce(text, chr(0) || 'null')) AS d,
                          source FROM '{path}'),
             n AS (SELECT doc_id, md5(coalesce(text, chr(0) || 'null')) AS d,
                          source
                   FROM (SELECT doc_id,
                                CASE WHEN doc_id % 4 = 0 THEN NULL ELSE text END AS text,
                                source
                         FROM '{path}' WHERE doc_id % 3 != 0)),
             j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                          CASE WHEN o.d IS NULL THEN 'added'
                               WHEN n.d IS NULL THEN 'removed'
                               WHEN o.d = n.d THEN 'unchanged'
                               ELSE 'changed' END AS status,
                          coalesce(n.source, o.source) AS source
                   FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
        SELECT doc_id, status, source FROM j
        """
        ).fetchall()
    )
    assert got == want


def test_composite_key_separator_adversarial(spark):
    """with_composite_key must keep distinct key tuples distinct even
    when key VALUES embed would-be separators or null sentinels — the
    failure mode of concat_ws-style key synthesis."""
    from fineweb_legal_spark.operators.diff import with_composite_key

    rows = [
        ("a\x1fb", "1"),   # collides with ("a", "b\x1f1") under \x1f-concat
        ("a", "b\x1f1"),
        ("x", None),       # collides with ("x", "\x00null") under sentinels
        ("x", "\x00null"),
        (None, "y"),
        ("", "y"),         # null vs empty string must stay distinct
    ]
    df = spark.createDataFrame(rows, ["k1", "k2"])
    keyed = with_composite_key(df, ["k1", "k2"])
    assert keyed.select("__diff_key").distinct().count() == len(rows)
    # deterministic: same tuple -> same key across computations
    again = with_composite_key(df, ["k1", "k2"]).select("__diff_key")
    assert (
        keyed.select("__diff_key").exceptAll(again).count() == 0
    )


def test_diff_with_composite_key_end_to_end(spark):
    """Per-turn diff through the synthesized key: self-diff is all
    unchanged; a one-turn edit is exactly one changed row."""
    from fineweb_legal_spark.operators.diff import (
        corpus_diff_summary,
        with_composite_key,
    )

    old = spark.createDataFrame(
        [("c1", 0, "hello"), ("c1", 1, "world"), ("c2", 0, "other")],
        ["conv_id", "turn_idx", "text"],
    )
    new = spark.createDataFrame(
        [("c1", 0, "hello"), ("c1", 1, "WORLD"), ("c2", 0, "other")],
        ["conv_id", "turn_idx", "text"],
    )
    k = lambda d: with_composite_key(d, ["conv_id", "turn_idx"])  # noqa: E731
    s = {
        r.status: r.n_docs
        for r in corpus_diff_summary(
            k(old), k(new), key_col="__diff_key", text_col="text"
        ).collect()
    }
    assert s == {"unchanged": 2, "changed": 1}
