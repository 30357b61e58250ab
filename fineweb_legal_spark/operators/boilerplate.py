"""Corpus-level boilerplate line removal (C4/RefinedWeb-style).

The per-document heuristics (webfilter F3, pipeline repetition rules)
catch repetition INSIDE a document; this operator catches lines repeated
ACROSS the corpus — nav chrome, disclaimers, canned acknowledgements —
by counting, per distinct line, how many documents contain it, and
stripping lines above a document-frequency threshold. No reference
analog (the reference's boilerplate list is static); this is the
data-driven corpus-scale variant.

Scale shape:
- line frequency = explode + groupBy(line) count(distinct doc) — one
  shuffle over (line_hash, doc) pairs, map-side combinable;
- the common-line set is tiny by construction (frequency >= min_docs
  bounds its size by corpus_lines / min_docs) and is BROADCAST back, so
  the strip pass is shuffle-free on the corpus side except the per-doc
  reassembly group;
- reassembly preserves original line order via the exploded position —
  an Arrow-batched grouped sort-join, linear per document.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def line_doc_frequency(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(line, n_docs): how many distinct documents contain each non-blank
    line (exact match, as C4 does; trim-insensitivity would go here)."""
    lines = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    )
    return (
        lines.filter(F.trim(F.col("line")) != "")
        .groupBy("line")
        .agg(F.count_distinct("_id").alias("n_docs"))
    )


_REBUILD_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("clean_text", T.StringType()),
    ]
)


def _rebuild(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("pos")
    return pd.DataFrame(
        {"id": [pdf["id"].iloc[0]], "clean_text": ["\n".join(pdf["line"])]}
    )


def strip_common_lines(
    docs: DataFrame,
    min_docs: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, clean_text): every document with its corpus-common lines
    (document frequency >= min_docs) removed, remaining lines in original
    order. Documents whose lines are ALL removed yield '' (empty string);
    null-text documents yield null."""
    common = (
        line_doc_frequency(docs, id_col, text_col)
        .filter(F.col("n_docs") >= min_docs)
        .select("line", F.lit(True).alias("_common"))
    )
    lines = docs.select(
        F.col(id_col).cast("string").alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    kept = (
        lines.join(F.broadcast(common), "line", "left")
        .filter(F.col("_common").isNull())
        .select("id", "pos", "line")
    )
    rebuilt = kept.groupBy("id").applyInPandas(_rebuild, schema=_REBUILD_SCHEMA)
    # re-attach docs that lost every line ('') or had null text (null)
    base = docs.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(text_col).isNotNull().alias("_had_text"),
    )
    return base.join(rebuilt, "id", "left").select(
        "id",
        F.when(F.col("clean_text").isNotNull(), F.col("clean_text"))
        .when(F.col("_had_text"), F.lit(""))
        .alias("clean_text"),
    )
