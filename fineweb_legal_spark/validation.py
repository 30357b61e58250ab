"""Data-validation checks (reference parity: src/fineweb_legal/validation.py
:18-134 — file integrity, score/bucket range, empty text, duplicate keys,
distribution sanity — re-expressed as one aggregate pass per table).

Each check returns rows in a uniform report schema so the whole suite is a
single unionable DataFrame (check string, ok boolean, detail string,
n long).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import spec


def _row(check: str, ok_col, n_col, detail: str):
    return F.struct(
        F.lit(check).alias("check"),
        ok_col.alias("ok"),
        n_col.cast("long").alias("n"),
        F.lit(detail).alias("detail"),
    )


def validate_verdicts(verdicts: DataFrame) -> DataFrame:
    """Five reference-style checks over a verdict/output frame."""
    agg = verdicts.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(
            (
                F.col("ppl_bucket").isNotNull()
                & ~F.col("ppl_bucket").between(0, spec.PPL_BUCKET_MAX)
            ).cast("long")
        ).alias("bad_bucket"),
        F.sum(
            (F.col("keep") & F.col("scrubbed_text").isNull()).cast("long")
        ).alias("kept_without_text"),
        F.sum(
            (
                F.col("keep")
                & (F.length(F.regexp_replace("scrubbed_text", "[ \t\n\r]", "")) == 0)
            ).cast("long")
        ).alias("kept_empty_text"),
        F.sum(
            (~F.col("keep") & F.col("reject_reason").isNull()).cast("long")
        ).alias("dropped_without_reason"),
    )
    dups = (
        verdicts.groupBy("conv_id", "turn_idx")
        .count()
        .filter("count > 1")
        .agg(F.count(F.lit(1)).alias("dup_keys"))
    )
    biggest = (
        verdicts.groupBy("reject_reason")
        .count()
        .agg(F.max("count").alias("max_bucket"), F.sum("count").alias("total"))
        .select(
            (F.col("max_bucket").cast("double") / F.col("total")).alias("max_frac")
        )
    )
    a = agg.crossJoin(dups).crossJoin(biggest)
    rows = F.array(
        _row(
            "bucket_range",
            F.col("bad_bucket") == 0,
            F.col("bad_bucket"),
            f"ppl_bucket outside [0,{spec.PPL_BUCKET_MAX}]",
        ),
        _row(
            "kept_have_text",
            F.col("kept_without_text") == 0,
            F.col("kept_without_text"),
            "kept rows missing scrubbed_text",
        ),
        _row(
            "no_empty_kept_text",
            F.col("kept_empty_text") == 0,
            F.col("kept_empty_text"),
            "kept rows with whitespace-only text",
        ),
        _row(
            "drops_have_reason",
            F.col("dropped_without_reason") == 0,
            F.col("dropped_without_reason"),
            "dropped rows missing reject_reason",
        ),
        _row(
            "no_duplicate_keys",
            F.col("dup_keys") == 0,
            F.col("dup_keys"),
            "duplicate (conv_id, turn_idx)",
        ),
        _row(
            "distribution_sanity",
            F.col("max_frac") <= 0.8,
            F.round(F.col("max_frac") * 100).cast("long"),
            "largest reason bucket pct (warn > 80%: annotation drift analog)",
        ),
    )
    return a.select(F.explode(rows).alias("r")).select("r.*")


def word_boundary_truncate(df: DataFrame, text_col: str, limit: int) -> DataFrame:
    """Reference F15 (annotator.py:89-94): cut to `limit` chars at the last
    word boundary and append '...' — pure column expressions."""
    t = F.col(text_col)
    head = F.substring(t, 1, limit)
    cut = F.regexp_extract(head, r"^(.*)\s\S*$", 1)
    # when no whitespace exists in the head, fall back to the hard cut
    cut = F.when(F.length(cut) > 0, cut).otherwise(head)
    return df.withColumn(
        "truncated",
        F.when(F.length(t) > limit, F.concat(cut, F.lit("..."))).otherwise(t),
    )


def hash_sample(df: DataFrame, key_col: str, hex_digits: int = 1) -> DataFrame:
    """Reproducible ~16^-digits sampling (reference O5 analog,
    determinism-hardened): keep rows whose md5(key) starts with that many
    '0' hex digits — engine-independent, unlike seeded RNG sampling."""
    prefix = F.substring(F.md5(F.col(key_col).cast("string")), 1, hex_digits)
    return df.filter(prefix == "0" * hex_digits)
