"""Benchmark decontamination: n-gram overlap between a training corpus and
an evaluation/benchmark set.

The standard LLM-pipeline hygiene step (FineWeb/GPT-3-style): any training
document sharing an n-word gram with a benchmark document is flagged (and
usually dropped) so evaluation scores are not inflated by memorized test
items. No reference analog — a new scale requirement of the
training-data toolkit.

Scale shape (10^12-row corpus, benchmark ≪ corpus):
- the benchmark's distinct gram hashes are computed once and BROADCAST —
  candidate matching is a broadcast hash join at the scan, never a shuffle
  of the corpus;
- corpus grams stream out of one Arrow-batched pandas pass (same
  tokenizer as the dedup family: lowercase + whitespace split) and are
  reduced per document by a map-side-combinable count aggregation; only
  (doc, hits) rows — never gram strings — reach the exchange;
- md5 gram hashing is deterministic across processes and engines, so the
  DuckDB oracle regenerates the same grams/hashes in pure SQL.

For a benchmark too large to broadcast (rare): same plan with the
broadcast replaced by a shuffle semi-join on the gram hash — the corpus
side then carries (doc_id, gram_hash) pairs, still never text.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import norm_words

_GRAM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("gram", T.StringType()),
    ]
)


def _gram_fn(n: int, id_col: str, text_col: str):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            grams: list[str] = []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                w = norm_words(text)
                if len(w) < n:
                    continue
                seen = set()
                for i in range(len(w) - n + 1):
                    g = " ".join(w[i : i + n])
                    h = hashlib.md5(g.encode("utf-8")).hexdigest()
                    if h not in seen:  # distinct per document
                        seen.add(h)
                        ids.append(int(rid))
                        grams.append(h)
            yield pd.DataFrame({"id": ids, "gram": grams})

    return fn


def ngram_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, gram): md5 of each distinct n-word gram per document."""
    return df.select(id_col, text_col).mapInPandas(
        _gram_fn(n, id_col, text_col), schema=_GRAM_SCHEMA
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-corpus-document contamination report against ``benchmark``:
    (doc_id, n_contaminated_grams, contaminated). A document is
    contaminated when any of its n-word grams appears anywhere in the
    benchmark set. Downstream drops `contaminated` rows (or audits the
    gram counts)."""
    bench_grams = (
        ngram_hashes(benchmark, id_col, text_col, n).select("gram").distinct()
    )
    doc_grams = ngram_hashes(docs, id_col, text_col, n)
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_contaminated_grams", F.lit(0)).alias(
                "n_contaminated_grams"
            ),
            (F.coalesce("n_contaminated_grams", F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )
