"""Corpus diff: release-to-release QA for a continuously-rebuilt corpus.

A training corpus is republished every time a filter threshold moves, a
dedup pass improves, or an ingest batch lands. The question a data team
asks before shipping the new version is always the same: WHAT CHANGED —
how many documents appeared/disappeared/mutated, and in which sources?
The reference has no analog (single-shot pipeline); this is the ops
counterpart of the filter-audit suite (`operators/audit.py`), applied
across corpus VERSIONS instead of across rule thresholds.

Shape: one full-outer join on the document key comparing a cheap content
digest (md5 of the text — computed JVM-side, so text itself never enters
the join), classified into added / removed / changed / unchanged, then
one map-side-combinable aggregate per requested grouping. At 100 TB both
sides are huge, so the join carries (key, digest, group) triples ONLY —
never text — and when both versions live bucketed by the key (the
attribute-store layout, `sources/bucketed.py`) the join plans
zero-Exchange. The per-row verdict frame is also the drill-down surface:
filter `status != 'unchanged'` and join text back by key to sample
concrete regressions.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["corpus_diff", "corpus_diff_summary", "with_composite_key"]


def with_composite_key(
    df: DataFrame, keys: Sequence[str], out_col: str = "__diff_key"
) -> DataFrame:
    """One deterministic join column for a composite document key (e.g.
    (conv_id, turn_idx) on per-turn tables): md5 of the key tuple's JSON
    struct. Why not ``concat_ws`` with a separator: a key VALUE
    containing the separator makes distinct tuples collide ("a\\x1fb", 1
    vs "a", "b\\x1f1"); JSON quoting removes the ambiguity, field names
    disambiguate null positions (``ignoreNullFields=false`` keeps nulls
    explicit), and the fixed 32-byte digest keeps the diff join slim
    regardless of key width."""
    s = F.struct(*[F.col(k) for k in keys])
    return df.withColumn(
        out_col, F.md5(F.to_json(s, {"ignoreNullFields": "false"}))
    )


def _slim(df: DataFrame, key_col: str, text_col: str, group_cols: Sequence[str], tag: str) -> DataFrame:
    cols = [
        F.col(key_col).alias("key"),
        F.md5(F.coalesce(F.col(text_col), F.lit("\x00null"))).alias(f"{tag}_digest"),
    ]
    cols += [F.col(c).alias(f"{tag}_{c}") for c in group_cols]
    return df.select(*cols)


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-document verdicts: (key, status, group columns) with status in
    {'added','removed','changed','unchanged'}. Group columns are taken
    from the NEW side for added/changed/unchanged rows and from the OLD
    side for removed rows (the version a reader of the diff can still
    find them in). Null text is digested as a sentinel distinct from
    every real text, so null -> '' counts as changed."""
    o = _slim(old, key_col, text_col, group_cols, "o")
    n = _slim(new, key_col, text_col, group_cols, "n")
    j = o.join(n, "key", "full_outer")
    status = (
        F.when(F.col("o_digest").isNull(), F.lit("added"))
        .when(F.col("n_digest").isNull(), F.lit("removed"))
        .when(F.col("o_digest") == F.col("n_digest"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    out = [F.col("key").alias(key_col), status.alias("status")]
    out += [
        F.coalesce(F.col(f"n_{c}"), F.col(f"o_{c}")).alias(c) for c in group_cols
    ]
    return j.select(*out)


def corpus_diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """The release-gate report: one row per (group, status) with counts,
    plus each group's old/new totals — a single aggregate over the diff
    verdicts (sorted output for stable eyeballing/golden files)."""
    d = corpus_diff(old, new, key_col, text_col, group_cols)
    gcols = list(group_cols)
    agg = d.groupBy(*gcols, "status").agg(F.count(F.lit(1)).alias("n_docs"))
    totals = d.groupBy(*gcols).agg(
        F.sum(F.when(F.col("status") != "added", 1).otherwise(0)).alias("old_total"),
        F.sum(F.when(F.col("status") != "removed", 1).otherwise(0)).alias("new_total"),
    )
    joined = agg.join(totals, gcols) if gcols else agg.crossJoin(F.broadcast(totals))
    return joined.orderBy(*gcols, "status")
