"""Reference stage-1 filter: Spark expressions == pandas oracle on the
webdocs fixture table (SURVEY.md §2.2 F1-F6 parity)."""

from __future__ import annotations

import pyarrow.parquet as pq

from fineweb_legal_spark.datasets import ensure_web_golden, ensure_webdocs
from fineweb_legal_spark.operators.webfilter import stage_reject_counts, web_filter


def test_webfilter_matches_oracle(spark):
    docs = spark.read.parquet(str(ensure_webdocs("t1")))
    got = web_filter(docs).toPandas().sort_values("id").reset_index(drop=True)
    gold = (
        pq.read_table(ensure_web_golden("t1"))
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    m = gold.merge(got, on="id", suffixes=("_g", "_s"))
    assert len(m) == len(gold)
    assert (m.keep_g == m.keep_s).all(), m[m.keep_g != m.keep_s].head()
    a, b = m.reject_reason_g, m.reject_reason_s
    neq = ~((a.isna() & b.isna()) | (a == b))
    assert int(neq.sum()) == 0, m[neq].head()


def test_stage_counts_sum_to_total(spark):
    docs = spark.read.parquet(str(ensure_webdocs("t1")))
    counts = stage_reject_counts(docs).toPandas()
    assert int(counts["docs"].sum()) == docs.count()
