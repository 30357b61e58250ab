"""Dataset split creation (reference parity: scripts/create_dataset_splits.py
and consolidate_and_clean.py:84-143).

The reference splits with a seeded RNG; a distributed engine can't reproduce
NumPy's permutation order, so the split is redefined as a DETERMINISTIC hash
split (stable under any partitioning/parallelism — the property the
reference actually wanted from its fixed seed): bucket = first two md5 hex
digits of the id (256 buckets) → train/val/test by cumulative fraction.
Overlap-freedom is structural (disjoint hash ranges) and still audited the
reference's way (intersect == 0, U4/J2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPLITS = (("train", 0.70), ("val", 0.15), ("test", 0.15))


def split_col(key, splits=SPLITS):
    bucket = F.conv(F.substring(F.md5(key.cast("string")), 1, 2), 16, 10).cast("int")
    acc = 0.0
    expr = None
    for name, frac in splits:
        acc += frac
        cond = bucket < int(round(acc * 256))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr.otherwise(F.lit(splits[-1][0]))


def assign_splits(df: DataFrame, key_col: str) -> DataFrame:
    return df.withColumn("split", split_col(F.col(key_col)))


def split_overlap_count(df: DataFrame, key_col: str, a: str, b: str) -> int:
    """Reference J2 audit: hash-key overlap between two splits must be 0."""
    sa = df.filter(F.col("split") == a).select(key_col)
    sb = df.filter(F.col("split") == b).select(key_col)
    return sa.intersect(sb).count()


def tier_filter(df: DataFrame, score_col: str, tier: str) -> DataFrame:
    """Quality tiers (F8: create_dataset_splits.py:26-30, >= semantics)."""
    from .. import spec

    return df.filter(F.col(score_col) >= spec.SCORE_TIERS[tier])
