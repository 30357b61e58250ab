"""Co-located bucketed join: the write-once-shuffle-never layout must plan
with zero Exchange on either join side (the whole point of paying the
bucket shuffle at write time)."""

from __future__ import annotations

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
