"""Explicit skew mitigation for equi-joins.

First line of defense at scale is AQE (`spark.sql.adaptive.skewJoin` splits
oversized shuffle partitions at runtime — on by default in session.py) and
`broadcast()` for small dims. `salted_join` covers the remaining case: a
heavy-hitter key distribution joined against a table too big to broadcast,
where one reducer would otherwise receive a whole hot key.

Mechanics: the skewed side gets a deterministic per-row salt in [0, S)
(hash of the full row content — stable across retries/partitionings, no
`rand()`); the other side is replicated S ways via explode; the join runs
on (key, salt), spreading each hot key over S reducers. Cost: S× the
build-side shuffle volume — pick S ≈ (hot-key rows / target partition
rows), not "big".

The same pattern in aggregate form (salt → partial agg → final agg) is
used by the pipeline's conversation-stats stage (pipeline.py); this module
is the join-shaped variant of SURVEY.md §4 P16.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `skewed` (heavy-hitter keys) with `other` on `key`,
    spreading each key over `salt` reducers. Result is identical to
    `skewed.join(other, key, how)` for inner/left joins."""
    if _SALT in skewed.columns or _SALT in other.columns:
        raise ValueError(f"salted_join reserves the {_SALT} column")
    # salt = hash(row content, per-partition ordinal): content alone would
    # send EXACT-duplicate rows of a hot key (repeated identical log
    # lines — the canonical heavy hitter) to one reducer again. The
    # ordinal spreads them; determinism holds whenever the input
    # partitioning is deterministic (same bar as the content hash — and
    # any salt value joins correctly since `other` is replicated for all
    # salts, so salt placement never affects the result set).
    salted = skewed.withColumn(
        _SALT,
        F.pmod(
            F.xxhash64(F.struct(*skewed.columns), F.monotonically_increasing_id()),
            F.lit(salt),
        ).cast("int"),
    )
    replicated = other.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted.join(replicated, [key, _SALT], how).drop(_SALT)


def skew_report(
    df: DataFrame, key: str, top_k: int = 20, salt_target_rows: int = 1_000_000
) -> DataFrame:
    """Pre-flight skew diagnostics for a planned join/agg key: the
    heaviest `top_k` keys with their share of the table and the salt
    factor `salted_join` would need to spread each to ~`salt_target_rows`
    rows per reducer. One groupBy(key) count (map-side combining makes
    the exchange one row per key per partition) + a TakeOrdered top-k —
    the same cost as the aggregation being planned, so running it first
    is never the bottleneck. Quantiles of the group-size distribution
    ride along via approx_percentile over the per-key counts.

    Columns: key (string), rows, share (of table), suggested_salt,
    p50_group / p99_group / max_group (identical on every row — the
    distribution context for the listed heavy keys).
    """
    counts = df.groupBy(F.col(key).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("rows")
    )
    dist = counts.agg(
        F.sum("rows").alias("total"),
        F.approx_percentile("rows", 0.5).alias("p50_group"),
        F.approx_percentile("rows", 0.99).alias("p99_group"),
        F.max("rows").alias("max_group"),
    )
    top = counts.orderBy(F.col("rows").desc(), "key").limit(top_k)
    return top.crossJoin(F.broadcast(dist)).select(
        "key",
        "rows",
        F.round(F.col("rows") / F.col("total"), 6).alias("share"),
        F.greatest(
            F.lit(1), F.ceil(F.col("rows") / F.lit(salt_target_rows))
        )
        .cast("int")
        .alias("suggested_salt"),
        "p50_group",
        "p99_group",
        "max_group",
    )
