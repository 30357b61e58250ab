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


def transcript_structure_checks(df: DataFrame) -> DataFrame:
    """Agent-transcript protocol sanity (input_hint schema: role + tool):
    per-check violation counts over (conv_id, turn_idx, role, tool).

    Checks: tool-role turns must name a tool and non-tool roles must not;
    a tool turn must directly follow an assistant or tool turn (tool
    chains are legal, a tool answering a user is not); conversations must
    open with user or system; turn_idx must be dense from 0 (gap = a lost
    turn upstream). One window pass + one aggregate — no driver loops."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    x = df.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        F.lag("role").over(w).alias("_prev_role"),
        F.lag("turn_idx").over(w).alias("_prev_idx"),
    )
    checks = {
        "tool_role_without_tool_name": (F.col("role") == "tool")
        & F.col("tool").isNull(),
        "tool_name_on_non_tool_role": (F.col("role") != "tool")
        & F.col("tool").isNotNull(),
        "tool_turn_not_after_assistant": (F.col("role") == "tool")
        & F.col("_prev_role").isNotNull()
        & ~F.col("_prev_role").isin("assistant", "tool"),
        "conv_opens_with_tool_or_assistant": F.col("_prev_idx").isNull()
        & ~F.col("role").isin("user", "system"),
        "turn_idx_gap": (
            F.when(
                F.col("_prev_idx").isNull(), F.col("turn_idx") != 0
            ).otherwise(F.col("turn_idx") != F.col("_prev_idx") + 1)
        ),
    }
    agg = x.agg(
        *[
            F.sum(cond.cast("long")).alias(name)
            for name, cond in checks.items()
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                F.col(name).alias("violations"),
            )
            for name in checks
        ]
    )
    return (
        agg.select(F.explode(rows).alias("r"))
        .select("r.check", "r.violations")
        .orderBy("check")
    )


def keep_drop_f1(
    pred: DataFrame,
    gold: DataFrame,
    keys: tuple[str, ...] = ("conv_id", "turn_idx"),
    keep_col: str = "keep",
    text_col: str = "scrubbed_text",
) -> DataFrame:
    """The north rule's acceptance metric, computed distributed: keep/drop
    confusion matrix + F1 vs reference labels, plus exact scrubbed-text
    agreement on the rows both sides keep — one key-partitioned full join
    (so missing/extra rows are counted, not silently inner-joined away)
    and one global aggregate. At 10^12 turns this is two key-hash
    exchanges and a single-row reduce; nothing else moves.

    Returns one row: turns, tp/fp/fn/tn, missing_pred/missing_gold,
    text_match/text_mismatch (kept-by-both rows only), precision, recall,
    f1, text_match_frac.
    """
    p = pred.select(
        *keys,
        F.col(keep_col).alias("p_keep"),
        F.col(text_col).alias("p_text"),
    )
    g = gold.select(
        *keys,
        F.col(keep_col).alias("g_keep"),
        F.col(text_col).alias("g_text"),
    )
    j = p.join(g, list(keys), "full")
    both = F.col("p_keep").isNotNull() & F.col("g_keep").isNotNull()
    pk = F.coalesce(F.col("p_keep"), F.lit(False))
    gk = F.coalesce(F.col("g_keep"), F.lit(False))
    cnt = lambda c: F.sum(c.cast("long"))  # noqa: E731
    agg = j.agg(
        F.count(F.lit(1)).alias("turns"),
        cnt(both & pk & gk).alias("tp"),
        cnt(both & pk & ~gk).alias("fp"),
        cnt(both & ~pk & gk).alias("fn"),
        cnt(both & ~pk & ~gk).alias("tn"),
        cnt(F.col("p_keep").isNull()).alias("missing_pred"),
        cnt(F.col("g_keep").isNull()).alias("missing_gold"),
        cnt(
            both & pk & gk & F.col("p_text").eqNullSafe(F.col("g_text"))
        ).alias("text_match"),
        cnt(
            both & pk & gk & ~F.col("p_text").eqNullSafe(F.col("g_text"))
        ).alias("text_mismatch"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return agg.select(
        "*",
        F.round(tp / F.greatest(tp + fp, F.lit(1)), 6).alias("precision"),
        F.round(tp / F.greatest(tp + fn, F.lit(1)), 6).alias("recall"),
        F.round(
            (2 * tp) / F.greatest(2 * tp + fp + fn, F.lit(1)), 6
        ).alias("f1"),
        F.round(
            F.col("text_match") / F.greatest(tp, F.lit(1)), 6
        ).alias("text_match_frac"),
    )
