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
