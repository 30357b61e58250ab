"""Dolma-style attribute store: tag once, filter many.

At 100 TB the expensive stages are the TAGGERS (model scoring, repetition
kernels, language ID) and the cheap stage is the boolean predicate over
their outputs — yet naive pipelines fuse the two, so every threshold
tweak re-pays the full tagging scan. The Dolma toolkit (Soldaini et al.
2024, "Dolma: an Open Corpus...", §3: taggers write attribute files;
mixing reads documents + attributes and applies a predicate) separates
them: attributes are persisted keyed by document id, and a re-filter is a
join + predicate — seconds of planning against already-paid parquet, not
a re-tag of the corpus. This module is that separation for this engine;
the reference has no analog (its filters recompute signals inline every
run — SURVEY.md §2.2).

Shape contract:
- an ATTRIBUTE SET is `keys + namespaced value columns`; value columns
  are prefixed ``{set_name}__`` at tag time so independently-produced
  sets (different teams, different runs) always compose without column
  collisions.
- any DataFrame whose rows are keyed per document/turn is already
  attribute-shaped — `namespace_attributes` adapts existing tagger
  output (pipeline verdicts, classifier scores, repetition signals)
  without recomputation.

Scale contract:
- persistence is either plain parquet (ad-hoc set, one shuffle-free
  columnar write) or a bucketed catalog table via
  `sources.bucketed.write_bucketed` — the repeat-join layout: an
  attribute set bucketed like its document table joins as a
  zero-Exchange sort-merge join (pytest-pinned in
  tests/test_attributes.py), so N re-filters pay ZERO join shuffles
  after the one-time bucket write.
- `join_attributes` LEFT-joins each set on the shared keys: documents
  missing from a set surface as nulls, and `filter_by_attributes`
  evaluates the predicate null-as-drop (``coalesce(pred, false)``) — the
  safe default for quality gates ("untagged" must never mean "kept").
  Pass ``keep_untagged=True`` to invert that for advisory sets.
- the filter output is the DOCUMENT schema only (attribute columns are
  projected away after the predicate), so downstream stages — dedup,
  mixture, packing — see the exact frame they'd see from an inline
  filter. Column pruning then keeps un-referenced attribute columns out
  of the attribute scan entirely (parquet ReadSchema carries only the
  predicate's columns).
"""

from __future__ import annotations

from typing import Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

__all__ = [
    "tag_attributes",
    "namespace_attributes",
    "write_attribute_set",
    "read_attribute_set",
    "join_attributes",
    "filter_by_attributes",
]

_SEP = "__"


def _check_set_name(set_name: str) -> None:
    if not set_name or _SEP in set_name:
        raise ValueError(
            f"attribute set name {set_name!r} must be non-empty and must "
            f"not contain {_SEP!r} (it is the namespace separator)"
        )


def tag_attributes(
    df: DataFrame,
    set_name: str,
    taggers: Mapping[str, Column],
    keys: Sequence[str] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """One tagging pass: keys + each tagger expression as
    ``{set_name}__{tagger}``. Expression taggers stay JVM-native (one
    codegen projection, no shuffle); DataFrame-producing taggers go
    through `namespace_attributes` instead."""
    _check_set_name(set_name)
    cols = [F.col(k) for k in keys]
    cols += [expr.alias(f"{set_name}{_SEP}{name}") for name, expr in taggers.items()]
    return df.select(*cols)


def namespace_attributes(
    df: DataFrame,
    set_name: str,
    keys: Sequence[str] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Adapt an existing keyed tagger output (pipeline verdicts,
    classifier scores, ...) into an attribute set: every non-key column
    is renamed ``{set_name}__{col}``. No data movement — a rename-only
    projection."""
    _check_set_name(set_name)
    cols = [F.col(k) for k in keys]
    cols += [
        F.col(c).alias(f"{set_name}{_SEP}{c}") for c in df.columns if c not in keys
    ]
    return df.select(*cols)


def write_attribute_set(
    attrs: DataFrame,
    target: str,
    *,
    as_table: bool = False,
    bucket_key: str | None = None,
    n_buckets: int = 32,
) -> None:
    """Persist an attribute set.

    ``as_table=False`` (default): plain snappy parquet at path `target` —
    the ad-hoc form. ``as_table=True``: a catalog table bucketed+sorted
    on ``bucket_key`` (default: the set's first column) — the layout that
    makes every later doc⋈attrs join zero-Exchange when the doc table is
    bucketed the same way."""
    if as_table:
        from fineweb_legal_spark.sources.bucketed import write_bucketed

        write_bucketed(attrs, target, bucket_key or attrs.columns[0], n_buckets)
    else:
        attrs.write.mode("overwrite").option("compression", "snappy").parquet(target)


def read_attribute_set(
    spark: SparkSession, source: str, *, as_table: bool = False
) -> DataFrame:
    """Load a persisted attribute set (path, or catalog table with
    ``as_table=True`` — the table form is required for the bucketed
    zero-Exchange join; `read.parquet` on the same files would discard
    the bucket spec)."""
    return spark.table(source) if as_table else spark.read.parquet(source)


def join_attributes(
    docs: DataFrame,
    attr_sets: Sequence[DataFrame],
    keys: Sequence[str] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """LEFT-join each attribute set onto the document frame on `keys`.

    Missing attribute rows surface as nulls (see module doc for the
    null-as-drop filter default). Join strategy is Catalyst's choice —
    broadcast for small sets, zero-Exchange SMJ for identically-bucketed
    tables, shuffled SMJ otherwise."""
    out = docs
    ks = list(keys)
    for attrs in attr_sets:
        dup = [c for c in attrs.columns if c not in ks and c in out.columns]
        if dup:
            raise ValueError(
                f"attribute columns {dup} collide with the document frame; "
                "namespace the set (tag_attributes/namespace_attributes)"
            )
        out = out.join(attrs, ks, "left")
    return out


def filter_by_attributes(
    docs: DataFrame,
    attr_sets: Sequence[DataFrame],
    predicate: Column,
    keys: Sequence[str] = ("conv_id", "turn_idx"),
    *,
    keep_untagged: bool = False,
) -> DataFrame:
    """The re-filter: join stored attributes, apply `predicate`, return
    rows in the DOCUMENT schema only. A threshold change re-runs THIS —
    never the taggers. Null predicate (document absent from a set, or a
    null attribute value) drops by default; ``keep_untagged=True`` keeps
    instead (advisory sets)."""
    joined = join_attributes(docs, attr_sets, keys)
    pred = F.coalesce(predicate, F.lit(bool(keep_untagged)))
    return joined.filter(pred).select(*docs.columns)
