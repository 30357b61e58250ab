"""As-of join and range(-band) join — two non-equi joins Spark has no
native operator for, built as compositions of shuffle-friendly primitives
(the (a) option of the custom-operator ladder: native ops, no UDF).

as-of join (union + window)
---------------------------
"For each left row, the most recent right row at-or-before its
timestamp, per key." The naive plan — per-left-row subquery or a
`left.ts >= right.ts` theta join — is O(n·m) per key and unusable at
scale. The scale shape is sort-based: tag and union both sides, one
shuffle on the key, one ordered window pass carrying the right-side
timestamp forward with `last(ignorenulls)`. Cost: a single exchange +
sort, identical to any windowed query; skew bounded by per-key rows.
DuckDB's native ASOF JOIN provides the independent oracle.

range-band join (bucketize + equi-join)
---------------------------------------
"Join fact value v to interval [lo, hi)." A small interval table is just
a broadcast theta join (BroadcastNestedLoopJoin — fine). When the
interval table is too big to broadcast, the scale path decomposes each
interval into coarse buckets of width `step`, equi-joins on the bucket id
(a plain shuffle join AQE can plan), and re-filters exactly — candidates
per row are O(interval_width / step), never the whole interval table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_ts_as: str = "asof_ts",
) -> DataFrame:
    """Left as-of join: every left row gains `right_ts_as`, the max right
    `ts` with right.ts <= left.ts for the same `key` (null if none).

    Equal timestamps match (>= semantics, like DuckDB ASOF). Only the
    right timestamp is carried — payload-free, so duplicate right
    timestamps cannot make the result ambiguous.
    """
    reserved = {"__side", right_ts_as}
    clash = reserved & set(left.columns)
    if clash:
        raise ValueError(f"asof_join reserved columns present on left: {clash}")
    lt = left.withColumn("__side", F.lit(1))
    rt = right.select(
        key, F.col(ts).alias(ts), F.lit(0).alias("__side")
    )
    # right rows must sort before left rows at the same timestamp so that
    # >= matches; __side 0 < 1 does exactly that
    u = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(
        F.when(F.col("__side") == 0, F.col(ts)), ignorenulls=True
    ).over(w)
    return (
        u.withColumn(right_ts_as, carried)
        .filter(F.col("__side") == 1)
        .drop("__side")
    )


def range_bucket_join(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    step: float = 50.0,
) -> DataFrame:
    """Join each fact row to the interval(s) [lo, hi) containing its
    value, via coarse-bucket equi-join + exact refilter (see module doc).
    `step` must not exceed the smallest interval width you want found in
    one bucket hop — each interval explodes into ceil(width/step)+1
    bucket rows."""
    if "__bucket" in facts.columns or "__bucket" in ranges.columns:
        raise ValueError("range_bucket_join reserves the __bucket column")
    f = facts.withColumn(
        "__bucket", F.floor(F.col(value_col) / F.lit(step)).cast("long")
    )
    # empty/reversed intervals match nothing; dropping them here also stops
    # a reversed interval from exploding into a descending bucket sequence
    r = ranges.filter(F.col(hi_col) > F.col(lo_col)).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(step)).cast("long"),
                F.floor((F.col(hi_col) - 1e-9) / F.lit(step)).cast("long"),
            )
        ),
    )
    return (
        f.join(r, "__bucket")
        .filter(
            (F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) < F.col(hi_col))
        )
        .drop("__bucket")
    )
