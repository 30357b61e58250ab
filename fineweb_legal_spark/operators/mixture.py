"""Dataset mixture construction: per-source deterministic sampling rates.

Training corpora are mixtures ("10% of crawl, 2x books, 0.5x forums...");
this operator materializes a mixture by sampling each source at its own
rate. Sampling is hash-deterministic (md5 of the row key), not seeded-RNG:
the same row set results on any engine, partitioning, or retry — the same
determinism-hardening as validation.hash_sample, generalized to
per-stratum rates. No reference analog — a training-data toolkit op.

Mechanics: rate r maps to an 8-hex-digit threshold floor(r * 16^8) (rate
1.0 maps to the sentinel "g", above every hex prefix); a row is kept when
the first 8 hex digits of md5(key) compare below the threshold string.
Fixed-width lowercase hex compares lexicographically in numeric order, so
the predicate is a plain string comparison both in Spark and in the
DuckDB oracle — no cross-engine integer parsing.

Scale shape: the rate table is a handful of rows (broadcast join); the
filter runs at the scan with no shuffle at all. Expected kept fraction
per source is r +- O(1/sqrt(rows)); exactness is per-ROW deterministic,
not per-count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEX_SPACE = 16**8


def rate_threshold_hex(rate: float) -> str:
    """Lexicographic threshold for a [0, 1] sampling rate: 8 hex digits,
    except rate 1.0 maps to "g" (> every hex prefix) so keep-everything
    sources really keep everything — "ffffffff" under a strict ``<`` would
    wrongly drop the ~2^-32 of rows whose md5 prefix is exactly that."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate {rate} outside [0, 1]")
    if rate >= 1.0:
        return "g"
    return format(min(int(rate * HEX_SPACE), HEX_SPACE - 1), "08x")


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row of `df` with its source's probability, deterministically
    in md5(key). Sources absent from `rates` use `default_rate` (0.0 =
    dropped — an explicit mixture is usually exhaustive)."""
    spark = df.sparkSession
    thr = spark.createDataFrame(
        [(s, rate_threshold_hex(r)) for s, r in sorted(rates.items())],
        [source_col, "_thr"],
    )
    keyed = df.join(F.broadcast(thr), source_col, "left").withColumn(
        "_thr", F.coalesce("_thr", F.lit(rate_threshold_hex(default_rate)))
    )
    keep = (
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8) < F.col("_thr")
    )
    return keyed.filter(keep).drop("_thr")
