"""Interpolated Kneser-Ney bigram LM: distributed training + per-doc
perplexity, 100% JVM-native (array functions + joins — zero Python UDFs,
zero per-document windows).

The north rule names a "KenLM-style n-gram perplexity scorer"; the
engine's production scorer (artifacts.py) matches the reference's
semantics with a hashed char-trigram table. This module adds the
textbook KenLM smoothing itself — interpolated Kneser-Ney with absolute
discounting (Chen & Goodman 1998 §2.7; Heafield 2011's KenLM estimates
the same family) — as a second trainable scorer over word bigrams:

    p(w2|w1) = max(c(w1 w2) - D, 0) / c(w1)
             + D * N1+(w1 *) / c(w1) * p_cont(w2)
    p_cont(w2) = N1+(* w2) / N1+(* *)
    doc ppl   = exp(-mean ln p over the doc's bigrams), 1.0 if none

with a top-V vocabulary (ties count-desc then word-asc) and every
out-of-vocabulary token folded to a single UNK symbol (chr(0) — the
corpus contract is NUL-free text, which the whitespace tokenizer cannot
produce from ordinary documents).

Spark-first shape, chosen deliberately:

- **Tokens and bigrams are array-native, not window-native**: split →
  filter-empties → (slice, slice, arrays_zip, posexplode) builds the
  per-doc bigram stream with ZERO Exchange — no per-document window, no
  doc_id shuffle. The only shuffles in training are the map-side-
  combinable count aggregations on word/bigram keys.
- **Vocabulary = TakeOrderedAndProject** (`orderBy(...).limit(V)`) over
  the word counts — per-partition heads, never a global sort or an
  unpartitioned window.
- **All four KN count statistics come from the bigram-type frame**
  (c(w1), N1+(w1 *), N1+(* w2), N1+(* *)) — aggregates of an aggregate,
  so their inputs are already tiny.
- **Scoring is a join of the mapped bigram stream against the
  probability table** on (w1, w2): the table is vocab-pruned (observed
  bigram TYPES, ≤ V² but practically far fewer), so AQE broadcasts it
  at real scale; when a giant vocab makes it exceed the broadcast
  threshold the same plan degrades to a shuffle-hash join on the pair
  key — never a driver collect.

Cross-engine determinism: every count is an exact integer; the
probability arithmetic is fixed-order IEEE double, so the DuckDB oracle
(a from-scratch SQL re-derivation in __spark_entry__.py, not a golden
twin) reproduces p bit-exactly; ln/avg/exp then differ by at most ULPs
before the round(4), the same accepted tolerance as every other float
query in the registry.

Reference parity: none — the reference scores with a pre-trained
external model (src/ scorer stage); in-engine LM TRAINING is a
training-data-toolkit capability beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WS_SPLIT = "[ \\t\\n\\r\\f\\x0b]+"
UNK = "\x00"


def _word_arrays(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, arr) — lowercased whitespace tokens with empties dropped
    (the engine's shared ascii-whitespace tokenizer contract,
    operators/decontam.ascii_words); null texts are excluded and get
    their perplexity at the final left join instead."""
    # array_remove, not a filter() lambda: the higher-order function is
    # CodegenFallback (interpreted per element), array_remove is codegen'd
    # — same result (drops every "" element)
    arr = F.array_remove(F.split(F.lower(F.col(text_col)), WS_SPLIT), "")
    return df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_kn_id"), arr.alias("arr")
    )


def _bigram_stream(words: DataFrame) -> DataFrame:
    """(id, w1, w2) — adjacent token pairs per document, array-natively
    (slice + zip + one posexplode), zero Exchange."""
    n = F.greatest(F.size("arr") - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(F.col("arr"), 1, n).alias("w1"),
        F.slice(F.col("arr"), 2, n).alias("w2"),
    )
    return words.select(
        "_kn_id", F.explode(pairs).alias("p")
    ).select("_kn_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))


def kn_vocabulary(words: DataFrame, vocab_size: int) -> DataFrame:
    """Top-``vocab_size`` tokens by (count desc, word asc) — one column
    ``w``. TakeOrderedAndProject, no global sort."""
    return (
        words.select(F.explode("arr").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(vocab_size)
        .select("w")
    )


def kn_doc_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 512,
    discount: float = 0.75,
    out_col: str = "kn_ppl",
) -> DataFrame:
    """(id_col, out_col) for EVERY input row: interpolated-KN bigram
    perplexity of each document under the LM fit on the whole input
    (self-scoring — the corpus-hygiene use; fit and score on different
    frames by lifting the internals if needed). Documents with fewer
    than two tokens (including null text) score exactly 1.0."""
    words = _word_arrays(df, text_col, id_col)
    vocab = kn_vocabulary(words, vocab_size)

    bi = _bigram_stream(words)
    # ONE vocab membership frame, self-joined twice via alias: the two
    # BroadcastExchanges canonicalize identically, so the second is a
    # ReusedExchange and the vocabulary aggregation runs once, not twice
    vt = vocab.withColumn("_in", F.lit(True))
    va, vb = vt.alias("_va"), vt.alias("_vb")
    mapped = (
        bi.join(
            F.broadcast(va), F.col("w1") == F.col("_va.w"), "left"
        )
        .join(F.broadcast(vb), F.col("w2") == F.col("_vb.w"), "left")
        .select(
            "_kn_id",
            F.when(F.col("_va._in"), F.col("w1"))
            .otherwise(F.lit(UNK))
            .alias("m1"),
            F.when(F.col("_vb._in"), F.col("w2"))
            .otherwise(F.lit(UNK))
            .alias("m2"),
        )
    )

    types = mapped.groupBy("m1", "m2").agg(F.count(F.lit(1)).alias("c12"))

    # all four KN count statistics as WINDOWS over the types frame, not
    # three aggregate-then-join-back branches: types is bounded by
    # (V+1)^2 rows, so the windows are cheap, and the expensive mapped
    # subtree appears ONCE here instead of four times (round 6: the
    # join-back formulation planned 32 input scans / 49 exchanges — each
    # of types/left/right/total re-instantiated scan->vocab-joins->agg).
    # The global window for N1+(* *) is a single-partition pass over the
    # same bounded frame. Arithmetic order matches the join formulation
    # exactly ((d * n1p_left) * (n1p_right / n1p_all), then / c1), so p
    # is bit-identical and the DuckDB oracle is untouched.
    from pyspark.sql import Window

    wm1 = Window.partitionBy("m1")
    wm2 = Window.partitionBy("m2")
    wall = Window.partitionBy()
    d = F.lit(float(discount))
    prob = types.select(
        "m1",
        "m2",
        (
            (
                F.greatest(F.col("c12") - d, F.lit(0.0))
                + d
                * F.count(F.lit(1)).over(wm1)
                * (
                    F.count(F.lit(1)).over(wm2)
                    / F.count(F.lit(1)).over(wall)
                )
            )
            / F.sum("c12").over(wm1)
        ).alias("p"),
    )

    scored = (
        mapped.join(F.broadcast(prob), ["m1", "m2"])
        .groupBy("_kn_id")
        .agg(F.exp(-F.avg(F.log("p"))).alias("_ppl"))
    )
    return df.select(F.col(id_col)).join(
        scored, F.col(id_col) == F.col("_kn_id"), "left"
    ).select(
        id_col,
        F.round(F.coalesce(F.col("_ppl"), F.lit(1.0)), 4).alias(out_col),
    )
