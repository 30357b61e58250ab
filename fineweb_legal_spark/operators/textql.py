"""Text-analysis operators over document tables (training-data pipeline
utilities): language-ID, quality scoring, token counting, fingerprinting.

All JVM-native except language-ID (Arrow-batched pandas UDF with the
broadcast trigram artifact — the D2 pattern, SURVEY.md §2.10).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..artifacts import get_artifacts

# BPE-ish token estimate: word pieces of <=4 chars (reference F16 analog:
# annotator.py:96-98 uses len//4; here per-word ceil(len/4) which tracks
# subword tokenizers better)
_TOKEN_RX = r"\S{1,4}"


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    ws_words = F.size(F.regexp_extract_all(t, F.lit(r"\S+"), 0)).cast("long")
    bpe_ish = F.size(F.regexp_extract_all(t, F.lit(_TOKEN_RX), 0)).cast("long")
    return df.withColumn("ws_tokens", ws_words).withColumn("bpe_ish_tokens", bpe_ish)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic [0,1] heuristic quality score: length saturation +
    stopword presence (mirrors the reference's cheap-heuristics-then-score
    shape; SQL-mirrored in the driver oracle)."""
    t = F.col(text_col)
    wc = F.size(F.split(t, " "))
    stop_hits = F.size(
        F.regexp_extract_all(
            F.concat(F.lit(" "), F.lower(t), F.lit(" ")),
            F.lit("(?<= )(?:the|a|and|of|to|in|is)(?= )"),
            0,
        )
    )
    score = F.round(
        F.least(F.lit(1.0), wc.cast("double") / 50) * 0.5
        + F.least(F.lit(1.0), stop_hits.cast("double") * 10 / wc) * 0.5,
        6,
    )
    return df.withColumn("quality_score", score)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: sha256 of the whitespace-normalized lowercase
    text, truncated to 16 hex chars (stable content address)."""
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(F.col(text_col)), "[ \t\n\r]+", " "), "^ | $", ""
    )
    return df.withColumn("fingerprint", F.substring(F.sha2(norm, 256), 1, 16))


_LANGID_SCHEMA_SUFFIX = [T.StructField("pred_lang", T.StringType())]


def predict_language(
    spark: SparkSession,
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *keep_cols, pred_lang) via the broadcast hashed-trigram
    classifier. ``keep_cols`` are scalar columns passed through the Arrow
    batch unchanged — the way to combine langid with native projections in
    ONE pass (no join back on id, no second scan); only scalars belong
    here, never the text column."""
    bc = spark.sparkContext.broadcast(get_artifacts())
    schema = T.StructType(
        [df.schema[id_col]]
        + [df.schema[c] for c in keep_cols]
        + [T.StructField("pred_lang", T.StringType())]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        arts = bc.value
        for pdf in batches:
            # one vectorized numpy pass over the whole Arrow batch (the same
            # kernel pipeline.py uses); per-row predict_lang paid the numpy
            # setup cost once per ROW (~5.5x slower, measured)
            texts = pdf[text_col].tolist()
            idx = [i for i, t in enumerate(texts) if t is not None]
            preds: list[str | None] = [None] * len(texts)
            if idx:
                batch_preds = arts.predict_lang_batch([texts[i] for i in idx])
                for j, i in enumerate(idx):
                    preds[i] = batch_preds[j]
            out = {id_col: pdf[id_col]}
            for c in keep_cols:
                out[c] = pdf[c]
            out["pred_lang"] = preds
            yield pd.DataFrame(out)

    return df.select(id_col, text_col, *keep_cols).mapInPandas(
        fn, schema=schema
    )


def repetition_signals(
    df: DataFrame,
    ns: tuple[int, ...] = (2, 3, 4),
    id_col: str = "doc_id",
    text_col: str = "text",
    impl: str = "arrow",
) -> DataFrame:
    """Gopher-style repetition signals: for each document and each n in
    ``ns``, the most frequent word n-gram and the fraction of the
    document's characters its occurrences cover (Rae et al. 2021 §A1.1
    "fraction of characters in the most common n-gram"; the reference's
    heuristic family is the same quality-rule school — annotator.py's
    duplicate-line fraction is the sibling signal, already native in
    pipeline.py).

    Output: (id, n, top_gram, top_cnt, top_gram_char_frac) — one row per
    document per n, documents with fewer than n words omitted for that n.
    Ties resolve deterministically to the lexicographically greatest gram
    among those with the highest covered-character count.

    ``impl="arrow"`` (default, the scale path): the per-document top
    gram is a ROW-LOCAL computation — no other document's data enters it
    — so one Arrow-batched kernel (split → count → argmax per n, the
    same documented per-string-kernel category as the MinHash shingler)
    computes it with ZERO exchanges, zero explodes, and O(words-in-doc)
    memory per row.  This exists because the exchange plan below, though
    map-side combinable and praised at 2M rows, was measured DYING at
    10M rows on 32 cores (round 5, tools/stress10m.py): ~1.5B exploded
    gram strings hit sort-based aggregation fallback and spilled >70 GB
    to disk before ENOSPC.  Shuffle volume ~15x corpus bytes is not a
    plan that survives 100 TB; a zero-shuffle kernel at ~linear cost is.

    ``impl="exchange"`` (the former default, kept for the plan audit and
    for engines where Python workers are unavailable): row-local
    arrays_zip n-gram stream, two chained explodes, two map-side
    combinable aggregations — the first exchange carries distinct
    (doc, n, gram) triples, the second one row per (doc, n).  Correct,
    and fine when corpus_bytes x gram_multiplier fits the shuffle tier;
    prefer "arrow" beyond that.

    Pathological single documents (10^8+ words) should be span-pre-split
    upstream, the same policy packing applies to giant conversations.
    """
    if impl == "arrow":
        return _repetition_signals_arrow(df, ns, id_col, text_col)
    if impl != "exchange":
        raise ValueError(f"impl {impl!r} not in ('arrow', 'exchange')")
    return _repetition_signals_exchange(df, ns, id_col, text_col)


def _repetition_signals_arrow(
    df: DataFrame,
    ns: tuple[int, ...],
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Zero-exchange kernel: count/argmax each document's n-grams inside
    one Arrow batch; the only non-scalar step is the row-local explode of
    the per-document (<=|ns|)-element result array.  Identical output
    contract to the exchange plan (same split/lower/tie semantics; the
    randomized Counter-twin parity test runs against BOTH impls)."""
    import re
    from collections import Counter

    from pyspark.sql.functions import pandas_udf

    ns = tuple(int(n) for n in ns)
    ws_rx = re.compile("[ \t\n\r\f\x0b]+")

    @pandas_udf(
        "array<struct<n:int,top_gram:string,top_cnt:bigint,covered:bigint>>"
    )
    def _tops(s: pd.Series) -> pd.Series:
        out = []
        for t in s:
            if t is None:
                out.append([])
                continue
            words = [w for w in ws_rx.split(t.lower()) if w]
            recs = []
            for n in ns:
                if len(words) < n:
                    continue
                counts = Counter(
                    " ".join(words[j : j + n])
                    for j in range(len(words) - n + 1)
                )
                gram, c = max(
                    counts.items(),
                    key=lambda kv: (kv[1] * len(kv[0]), kv[0]),
                )
                recs.append(
                    {
                        "n": n,
                        "top_gram": gram,
                        "top_cnt": c,
                        "covered": c * len(gram),
                    }
                )
            out.append(recs)
        return pd.Series(out)

    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("_chars"),
        F.explode(_tops(F.col(text_col))).alias("_t"),
    )
    return base.select(
        id_col,
        F.col("_t.n").alias("n"),
        F.col("_t.top_gram").alias("top_gram"),
        F.col("_t.top_cnt").alias("top_cnt"),
        F.round(
            F.col("_t.covered").cast("double") / F.col("_chars"), 6
        ).alias("top_gram_char_frac"),
    )


def _repetition_signals_exchange(
    df: DataFrame,
    ns: tuple[int, ...],
    id_col: str,
    text_col: str,
) -> DataFrame:
    max_n = max(ns)
    w = F.array_remove(
        F.split(F.lower(F.col(text_col)), "[ \t\n\r\f\x0b]+"), ""
    )
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.length(F.col(text_col)).alias("_chars"), w.alias("_w1")
    )
    for i in range(2, max_n + 1):
        base = base.withColumn(
            f"_w{i}", F.slice(F.col("_w1"), i, F.size(F.col("_w1")))
        )
    z = base.select(
        id_col,
        "_chars",
        F.explode(
            F.arrays_zip(*[F.col(f"_w{i}") for i in range(1, max_n + 1)])
        ).alias("_z"),
    )

    def gram(n: int):
        parts: list = []
        for i in range(1, n + 1):
            if i > 1:
                parts.append(F.lit(" "))
            parts.append(F.col("_z").getField(f"_w{i}"))
        return F.concat(*parts)  # null-propagating: ragged tail drops out

    grams = z.select(
        id_col,
        "_chars",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("n"), gram(n).alias("gram")
                    )
                    for n in ns
                ]
            )
        ).alias("_g"),
    ).select(
        id_col,
        "_chars",
        F.col("_g.n").alias("n"),
        F.col("_g.gram").alias("gram"),
    ).filter(F.col("gram").isNotNull())
    counts = grams.groupBy(id_col, "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt"), F.first("_chars").alias("_chars")
    )
    top = counts.groupBy(id_col, "n").agg(
        F.max(
            F.struct(
                (F.col("cnt") * F.length("gram")).alias("covered"),
                F.col("gram"),
                F.col("cnt"),
            )
        ).alias("_top"),
        F.first("_chars").alias("_chars"),
    )
    return top.select(
        id_col,
        "n",
        F.col("_top.gram").alias("top_gram"),
        F.col("_top.cnt").alias("top_cnt"),
        F.round(
            F.col("_top.covered").cast("double") / F.col("_chars"), 6
        ).alias("top_gram_char_frac"),
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    n_docs: int | None = None,
) -> DataFrame:
    """Top-k TF-IDF terms per source — the classic corpus-characterization
    report ("what words distinguish each slice of the mixture").

    tf = term occurrences within the source's documents;
    idf = ln(N_docs / doc_freq); score = round(tf * idf, 4) with a
    (score desc, term asc) tiebreak. All JVM-native: one explode + two
    aggregations (both map-side combinable) + one small top-k window;
    doc_freq's exchange carries (term, doc) pairs, never text.

    N_docs is either the caller-supplied ``n_docs`` (e.g. from catalog
    stats) or a LAZY one-row count aggregate broadcast-cross-joined into
    the scored frame — plan construction launches zero jobs (round 3
    ran an eager df.count() here: a blocking extra action before the
    query started). The count's scan is column-pruned to the text
    null-check and runs inside the same job.
    """
    from pyspark.sql import Window

    nonnull = df.filter(F.col(text_col).isNotNull())
    words = nonnull.select(
        F.col(id_col).alias("_id"),
        F.col(source_col).alias("source"),
        F.explode(
            F.split(F.lower(F.col(text_col)), "[ \t\n\r\f\x0b]+")
        ).alias("term"),
    ).filter(F.col("term") != "")
    docfreq = words.groupBy("term").agg(
        F.count_distinct("_id").alias("_df")
    )
    tf = words.groupBy("source", "term").agg(F.count(F.lit(1)).alias("_tf"))
    scored = tf.join(docfreq, "term")
    if n_docs is not None:
        scored = scored.withColumn("_n", F.lit(float(n_docs)))
    else:
        n_frame = nonnull.agg(
            F.count(F.lit(1)).cast("double").alias("_n")
        )
        scored = scored.crossJoin(F.broadcast(n_frame))
    scored = scored.select(
        "source",
        "term",
        F.round(
            F.col("_tf") * F.log(F.col("_n") / F.col("_df")), 4
        ).alias("tfidf"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("source", "rank", "term", "tfidf")
    )


# Gopher rule thresholds (Rae et al. 2021, Table A1): max fraction of
# characters in the most common n-gram
GOPHER_TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}

# ... and max fraction of characters inside DUPLICATE n-grams (same table,
# the family's other half: all n-grams occurring more than once, coverage
# counted once per word even when duplicated grams overlap)
GOPHER_DUP_NGRAM_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def dup_ngram_signals(
    df: DataFrame,
    ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher duplicate-n-gram coverage (Rae et al. 2021 §A1.1 "fraction
    of characters in duplicate n-grams", the top-n-gram family's sibling —
    ``repetition_signals`` measures the single most frequent gram, this
    measures ALL grams that occur more than once).

    Output: (id, n, dup_char_frac) per document per n in ``ns`` —
    ``dup_char_frac`` = word characters covered by at least one occurrence
    of a duplicated n-gram / total word characters, with overlapping gram
    intervals unioned so no character is counted twice (the published
    rule's stated semantics). Characters are WORD characters under the
    dedup normalization (lowercase, ASCII-whitespace tokens — the same
    boundary as decontam/spandedup and the DuckDB oracle); separator
    whitespace is excluded from numerator and denominator alike, which
    makes the fraction invariant to run-length of whitespace. Documents
    with fewer than n words omit that n's row (no gram can form), matching
    ``repetition_signals``.

    Scale shape: the signal is a pure per-row function of the document, so
    the plan is ONE mapInPandas over (id, text) — zero Exchange, zero
    lambda HOFs, embarrassingly parallel (pytest-pinned). Per n the kernel
    is vectorized: the shared crc32+Horner rolling-hash stream
    (``decontam.rolling_gram_hash_stream``) finds duplicate gram hashes
    via np.unique, and interval union is a diff-array cumsum — O(words)
    numpy per (doc, n), no Python-level gram loop. Hash identity: two
    DIFFERENT grams of one document colliding under the 64-bit rolling
    hash would overstate coverage; at ~10^4 grams/doc the in-doc birthday
    bound is ~10^-12 — the same accepted trade as decontam, and
    unobservable at test scale.
    """
    import numpy as np

    from .decontam import ascii_words, gram_hashes_from_word_hashes, word_hashes

    ns_sorted = tuple(sorted(ns))
    # the id rides through with its INPUT type — a hardcoded LongType here
    # once made string conv ids coerce the verdict join to bigint
    # (LongHashedRelation cast crash at 2M turns)
    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("n", T.IntegerType()),
            T.StructField("_frac", T.DoubleType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id: list = []
            out_n: list[int] = []
            out_f: list[float] = []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                w = ascii_words(text)
                if len(w) < ns_sorted[0]:
                    continue
                wl = np.fromiter(
                    (len(x) for x in w), dtype=np.int64, count=len(w)
                )
                total = int(wl.sum())
                wh = word_hashes(w)  # crc32 each word ONCE across all ns
                for n in ns_sorted:
                    if len(w) < n:
                        break  # ns sorted: larger n can't fit either
                    g = gram_hashes_from_word_hashes(wh, n)
                    _, inv, cnt = np.unique(
                        g, return_inverse=True, return_counts=True
                    )
                    starts = np.nonzero(cnt[inv] >= 2)[0]
                    if len(starts):
                        d = np.zeros(len(w) + 1, dtype=np.int64)
                        np.add.at(d, starts, 1)
                        np.add.at(d, starts + n, -1)
                        covered = np.cumsum(d[:-1]) > 0
                        frac = float(wl[covered].sum()) / total
                    else:
                        frac = 0.0
                    out_id.append(rid)
                    out_n.append(n)
                    out_f.append(frac)
            if out_id:
                yield pd.DataFrame(
                    {
                        id_col: pd.Series(out_id),
                        "n": pd.array(out_n, dtype="int32"),
                        "_frac": pd.array(out_f, dtype="float64"),
                    }
                )

    return (
        df.filter(F.col(text_col).isNotNull())
        .select(id_col, text_col)
        .mapInPandas(fn, schema)
        # round JVM-side (HALF_UP, same as the oracle's round()) — Python's
        # round() is half-even and would diverge on exact midpoints
        .select(
            id_col, "n", F.round("_frac", 6).alias("dup_char_frac")
        )
    )


def filter_repetition(
    df: DataFrame,
    thresholds: dict[int, float] | None = None,
    dup_thresholds: dict[int, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher repetition FILTER: df + (rep_reject_reason) where the reason
    names the first violated rule ("top_2gram" < "top_3gram" < ... <
    "dup_5gram" < ...) or is null for keeps. Composes repetition_signals
    (one pass, two map-side-combinable exchanges) and dup_ngram_signals
    (one zero-Exchange Arrow pass) with a broadcast-able verdict join back
    on the id — docs too short to form an n-gram trivially pass that rule,
    like the reference's length-gated heuristics. Thresholds default to
    the published Gopher values; pass ``{}`` to disable a family. A top
    gram occurring ONCE is not repetition: short documents would trivially
    "violate" any fraction threshold (one 18-char bigram is 36% of a
    50-char doc), so the top rule only fires at top_cnt >= 2 — the
    length-gating Gopher gets implicitly from web-scale document lengths,
    made explicit here. The dup rule needs no such gate: coverage is zero
    unless some gram genuinely occurs twice.
    """
    thresholds = GOPHER_TOP_NGRAM_MAX if thresholds is None else thresholds
    dup_thresholds = (
        GOPHER_DUP_NGRAM_MAX if dup_thresholds is None else dup_thresholds
    )

    def _thr_col(thr: dict[int, float]):
        return F.coalesce(
            *[F.when(F.col("n") == n, F.lit(t)) for n, t in sorted(thr.items())]
        )

    parts: list[DataFrame] = []
    if thresholds:
        sig = repetition_signals(
            df, ns=tuple(sorted(thresholds)), id_col=id_col, text_col=text_col
        )
        parts.append(
            sig.withColumn("_thr", _thr_col(thresholds))
            .filter(
                (F.col("top_cnt") >= 2)
                & (F.col("top_gram_char_frac") > F.col("_thr"))
            )
            .select(
                F.col(id_col),
                F.col("n").alias("_order"),
                F.concat(
                    F.lit("top_"), F.col("n").cast("string"), F.lit("gram")
                ).alias("_reason"),
            )
        )
    if dup_thresholds:
        dup = dup_ngram_signals(
            df, ns=tuple(sorted(dup_thresholds)), id_col=id_col,
            text_col=text_col,
        )
        parts.append(
            dup.withColumn("_thr", _thr_col(dup_thresholds))
            .filter(F.col("dup_char_frac") > F.col("_thr"))
            .select(
                F.col(id_col),
                # dup rules sort after every top rule, then by n
                (F.col("n") + F.lit(100)).alias("_order"),
                F.concat(
                    F.lit("dup_"), F.col("n").cast("string"), F.lit("gram")
                ).alias("_reason"),
            )
        )
    if not parts:
        return df.withColumn("rep_reject_reason", F.lit(None).cast("string"))
    allv = parts[0]
    for p in parts[1:]:
        allv = allv.unionByName(p)
    viol = allv.groupBy(id_col).agg(
        F.min(F.struct("_order", "_reason")).alias("_v")
    )
    return (
        df.join(viol, id_col, "left")
        .withColumn("rep_reject_reason", F.col("_v._reason"))
        .drop("_v")
    )


# Gopher document-shape thresholds (Rae et al. 2021, Table A1)
GOPHER_MIN_ALPHA_WORD_FRAC = 0.80   # >=80% of words contain a letter
GOPHER_MAX_BULLET_LINE_FRAC = 0.90  # <=90% of lines start with a bullet
GOPHER_MAX_ELLIPSIS_LINE_FRAC = 0.30  # <=30% of lines end with an ellipsis


def doc_shape_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher document-shape quality signals (Rae et al. 2021 §A1.1), the
    rule family's remaining members next to the pipeline's stop-word /
    dup-line / symbol rules and this module's repetition signals:

    - ``alpha_word_frac`` — fraction of whitespace words containing at
      least one ASCII letter (rule: >= 0.80; catches number/symbol soup);
      null when the document has no words;
    - ``bullet_line_frac`` — fraction of lines starting with a bullet
      (``- • *`` after optional indent; rule: <= 0.90);
    - ``ellipsis_line_frac`` — fraction of lines ending with ``...`` or
      ``…`` (rule: <= 0.30; truncated-content listings).

    All three are JVM-native regexp counts over the row — zero UDF, zero
    shuffle, whole-stage-codegen'd; line fractions count split('\\n')
    parts including blanks (blank lines match neither pattern), the
    engine-neutral denominator.
    """
    t = F.col(text_col)
    words = F.size(F.regexp_extract_all(t, F.lit(r"\S+"), 0))
    alpha = F.size(F.regexp_extract_all(t, F.lit(r"\S*[A-Za-z]\S*"), 0))
    lines = F.size(F.split(t, "\n"))
    bullet = F.size(F.regexp_extract_all(t, F.lit(r"(?m)^[ \t]*[-•*]"), 0))
    ellipsis = F.size(
        F.regexp_extract_all(t, F.lit(r"(?m)(\.\.\.|…)[ \t]*$"), 0)
    )
    frac = lambda num, den: F.round(  # noqa: E731
        num.cast("double") / F.when(den > 0, den), 6
    )
    return (
        df.withColumn("alpha_word_frac", frac(alpha, words))
        .withColumn("bullet_line_frac", frac(bullet, lines))
        .withColumn("ellipsis_line_frac", frac(ellipsis, lines))
    )


def filter_doc_shape(df: DataFrame, text_col: str = "text") -> DataFrame:
    """df + shape_reject_reason ('alpha_words' | 'bullet_lines' |
    'ellipsis_lines', first violated in that order; null = keep) at the
    published Gopher thresholds over :func:`doc_shape_signals`. Wordless
    or null documents have no alpha signal and pass that rule (the
    pipeline's length gates own empty-text rejection)."""
    sig = doc_shape_signals(df, text_col=text_col)
    return sig.withColumn(
        "shape_reject_reason",
        F.when(
            F.col("alpha_word_frac") < GOPHER_MIN_ALPHA_WORD_FRAC,
            F.lit("alpha_words"),
        )
        .when(
            F.col("bullet_line_frac") > GOPHER_MAX_BULLET_LINE_FRAC,
            F.lit("bullet_lines"),
        )
        .when(
            F.col("ellipsis_line_frac") > GOPHER_MAX_ELLIPSIS_LINE_FRAC,
            F.lit("ellipsis_lines"),
        ),
    ).drop("alpha_word_frac", "bullet_line_frac", "ellipsis_line_frac")


# FineWeb custom quality-rule thresholds (Penedo et al. 2024 §3.6 — the
# three filters their ablations added on top of the C4/Gopher sets, plus
# the companion newline-density rule; exact cut points vary slightly
# between published configs, so they're parameters with these defaults)
FINEWEB_MIN_PUNCT_LINE_FRAC = 0.12    # drop if < 12% of lines end in punct
FINEWEB_SHORT_LINE_CHARS = 30
FINEWEB_MAX_SHORT_LINE_FRAC = 0.67    # drop if > 67% of lines are short
FINEWEB_MAX_DUP_LINE_CHAR_FRAC = 0.10  # drop if > 10% of chars in dup lines
FINEWEB_MAX_NEWLINE_WORD_FRAC = 0.30  # drop if newlines/words > 0.30
_FW_PUNCT_RX = r"(?m)[.!?\"'][ \t]*$"  # line's last non-blank char


def fineweb_quality_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """FineWeb custom quality signals (Penedo et al. 2024 §3.6), the
    line-shape half of the rule family (the duplicated-line-character
    signal needs per-document line grouping and lives in
    :func:`dup_line_chars`):

    - ``punct_line_frac`` — fraction of lines whose last non-blank char is
      terminal punctuation (``. ! ? " '``; rule: >= 0.12, low values are
      menus/listings);
    - ``short_line_frac`` — fraction of lines shorter than 30 characters
      (rule: <= 0.67; raw line length, blanks count as short);
    - ``newline_word_frac`` — newline count / whitespace-word count
      (rule: <= 0.30; catches list-like pages); null when wordless.

    All JVM-native regexp/length arithmetic — zero UDF, zero shuffle,
    whole-stage-codegen'd; line fractions share doc_shape_signals'
    split('\\n')-including-blanks denominator.
    """
    t = F.col(text_col)
    lines = F.size(F.split(t, "\n"))
    punct = F.size(F.regexp_extract_all(t, F.lit(_FW_PUNCT_RX), 0))
    long_lines = F.size(
        F.regexp_extract_all(
            t, F.lit(r"(?m)^.{%d,}" % FINEWEB_SHORT_LINE_CHARS), 0
        )
    )
    words = F.size(F.regexp_extract_all(t, F.lit(r"\S+"), 0))
    frac = lambda num, den: F.round(  # noqa: E731
        num.cast("double") / F.when(den > 0, den), 6
    )
    return (
        df.withColumn("punct_line_frac", frac(punct, lines))
        .withColumn("short_line_frac", frac(lines - long_lines, lines))
        .withColumn("newline_word_frac", frac(lines - 1, words))
    )


def dup_line_chars(df: DataFrame, text_col: str = "text") -> DataFrame:
    """df + ``dup_line_char_frac`` — fraction of the document's line
    characters (newlines excluded) inside lines that occur MORE THAN ONCE
    within the document, exact match on the raw split('\\n') line. The
    FineWeb/Gopher duplicated-line signal at character granularity
    (Penedo et al. 2024 §3.6; Rae et al. 2021 §A1.1): boilerplate
    navigation repeated down a page survives word-gram rules when lines
    are short, and this catches it. Blank duplicate lines weigh zero
    chars, so the signal is blank-robust with no special-casing. Null
    when the text is null or has zero line characters.

    Scale shape: a pure per-row signal, so the plan is ONE pass-through
    mapInPandas — zero Exchange, embarrassingly parallel, same contract
    as dup_ngram_signals (pytest-pinned). The kernel is vectorized
    pandas: one explode + one (row, line) groupby per Arrow batch, no
    Python-level per-line loop. Pass-through means every input column
    rides the Arrow round-trip; call on a slim projection when only the
    signal is needed.
    """
    import numpy as np

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("_dlcf", T.DoubleType())]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ex = pdf[text_col].str.split("\n").explode()
            ex = ex[ex.notna()]
            if len(ex):
                g = (
                    pd.DataFrame(
                        {
                            "_i": ex.index,
                            "_line": ex.to_numpy(),
                            "_len": ex.str.len().to_numpy(),
                        }
                    )
                    .groupby(["_i", "_line"], sort=False)
                    .agg(_cnt=("_len", "size"), _len=("_len", "first"))
                    .reset_index()
                )
                tot = (g["_len"] * g["_cnt"]).to_numpy()
                per = pd.DataFrame(
                    {
                        "_tot": tot,
                        "_dup": np.where(g["_cnt"].to_numpy() > 1, tot, 0),
                    },
                    index=g["_i"].to_numpy(),
                ).groupby(level=0).sum()
                frac = per["_dup"] / per["_tot"].where(per["_tot"] > 0)
                pdf = pdf.assign(_dlcf=frac.reindex(pdf.index))
            else:
                pdf = pdf.assign(_dlcf=float("nan"))
            yield pdf

    return (
        df.mapInPandas(fn, out_schema)
        # round JVM-side (HALF_UP, matching the oracle's round())
        .withColumn("dup_line_char_frac", F.round("_dlcf", 6))
        .drop("_dlcf")
    )


def filter_fineweb_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """df + ``fw_reject_reason`` ('line_punct' | 'short_lines' |
    'dup_line_chars' | 'newline_words', first violated in that order;
    null = keep) at the module-default FineWeb thresholds over
    :func:`fineweb_quality_signals` + :func:`dup_line_chars`. Wordless
    documents (null/empty/whitespace text) skip every rule and pass — the
    pipeline's length gates own empty-text rejection, same contract as
    filter_doc_shape. Plan: native signal columns feed one pass-through
    Arrow stage — zero Exchange end to end.
    """
    sig = dup_line_chars(
        fineweb_quality_signals(df, text_col=text_col), text_col=text_col
    )
    has_words = (
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0)) > 0
    )
    verdict = (
        F.when(
            F.col("punct_line_frac") < FINEWEB_MIN_PUNCT_LINE_FRAC,
            F.lit("line_punct"),
        )
        .when(
            F.col("short_line_frac") > FINEWEB_MAX_SHORT_LINE_FRAC,
            F.lit("short_lines"),
        )
        .when(
            F.col("dup_line_char_frac") > FINEWEB_MAX_DUP_LINE_CHAR_FRAC,
            F.lit("dup_line_chars"),
        )
        .when(
            F.col("newline_word_frac") > FINEWEB_MAX_NEWLINE_WORD_FRAC,
            F.lit("newline_words"),
        )
    )
    return sig.withColumn(
        "fw_reject_reason", F.when(has_words, verdict)
    ).drop(
        "punct_line_frac",
        "short_line_frac",
        "newline_word_frac",
        "dup_line_char_frac",
    )


def repetition_profile(
    df: DataFrame,
    ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
    text_col: str = "text",
) -> DataFrame:
    """df + the full Gopher repetition PROFILE from ONE pass-through
    mapInPandas — zero Exchange (the verdict-path alternative to
    repetition_signals' exchange-based plan, which must shuffle distinct
    (doc, n, gram) triples because it reports the top gram STRING; a
    filter only needs counts and fractions, and those are pure per-row
    functions of the document). Measured at 2M turns/local[32]: the
    composed signals path's gram exchange carries ~240M rows; this pass
    carries zero.

    Appended columns, raw so the THRESHOLD compare can stay JVM-side with
    exact HALF_UP rounding parity to the composed path:

    - ``_rep_chars`` — length(text);
    - ``_top_cnt_{n}`` / ``_top_cov_{n}`` for n in ``ns`` — occurrence
      count and covered characters (cnt × gram-string length) of the
      winning gram under the composed path's exact tie order
      max(covered, gram string, cnt); null when the doc has < n words;
    - ``_dup_frac_{n}`` for n in ``dup_ns`` — unrounded interval-unioned
      duplicated-gram word-char fraction (dup_ngram_signals' kernel
      semantics); null when the doc has < n words.

    Same 64-bit rolling-hash identity trade as dup_ngram_signals
    (in-doc birthday bound ~1e-12); gram tie-break compares Python str
    (code points) where the JVM compares UTF8 bytes — identical on BMP
    text, and ties require exact covered-char equality to matter at all.
    """
    import numpy as np

    from .decontam import ascii_words, gram_hashes_from_word_hashes, word_hashes

    ns = tuple(sorted(ns))
    dup_ns = tuple(sorted(dup_ns))
    new_fields = [T.StructField("_rep_chars", T.LongType())]
    for n in ns:
        new_fields.append(T.StructField(f"_top_cnt_{n}", T.LongType()))
        new_fields.append(T.StructField(f"_top_cov_{n}", T.LongType()))
    for n in dup_ns:
        new_fields.append(T.StructField(f"_dup_frac_{n}", T.DoubleType()))
    schema = T.StructType(list(df.schema.fields) + new_fields)
    names = [f.name for f in new_fields]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in names}
            for text in pdf[text_col]:
                row: dict[str, object] = {c: None for c in names}
                if text is not None:
                    row["_rep_chars"] = len(text)
                    w = ascii_words(text)
                    if w:
                        wl = np.fromiter(
                            (len(x) for x in w), dtype=np.int64, count=len(w)
                        )
                        cum = np.concatenate(([0], np.cumsum(wl)))
                        wchars = int(cum[-1])
                        wh = word_hashes(w)  # once across ns AND dup_ns
                        for n in ns:
                            if len(w) < n:
                                break
                            g = gram_hashes_from_word_hashes(wh, n)
                            _, first, inv, cnt = np.unique(
                                g,
                                return_index=True,
                                return_inverse=True,
                                return_counts=True,
                            )
                            # gram-string length at the first occurrence:
                            # window word chars + (n-1) separators
                            glen = cum[first + n] - cum[first] + (n - 1)
                            cov = cnt * glen
                            mx = int(cov.max())
                            cand = np.nonzero(cov == mx)[0]
                            if len(cand) > 1:
                                best = max(
                                    cand,
                                    key=lambda u: (
                                        " ".join(
                                            w[first[u] : first[u] + n]
                                        ),
                                        int(cnt[u]),
                                    ),
                                )
                            else:
                                best = cand[0]
                            row[f"_top_cnt_{n}"] = int(cnt[best])
                            row[f"_top_cov_{n}"] = mx
                        for n in dup_ns:
                            if len(w) < n:
                                break
                            g = gram_hashes_from_word_hashes(wh, n)
                            _, inv, cnt = np.unique(
                                g, return_inverse=True, return_counts=True
                            )
                            starts = np.nonzero(cnt[inv] >= 2)[0]
                            if len(starts):
                                d = np.zeros(len(w) + 1, dtype=np.int64)
                                np.add.at(d, starts, 1)
                                np.add.at(d, starts + n, -1)
                                covered = np.cumsum(d[:-1]) > 0
                                row[f"_dup_frac_{n}"] = (
                                    float(wl[covered].sum()) / wchars
                                )
                            else:
                                row[f"_dup_frac_{n}"] = 0.0
                for c in names:
                    out[c].append(row[c])
            res = pdf.copy()
            for c in names:
                res[c] = pd.Series(out[c], index=pdf.index, dtype=object)
            yield res

    return df.mapInPandas(fn, schema)


def filter_repetition_fused(
    df: DataFrame,
    thresholds: dict[int, float] | None = None,
    dup_thresholds: dict[int, float] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """filter_repetition's exact verdict semantics (same thresholds, same
    HALF_UP round-to-6 before the > compare, same reason ranking, same
    top_cnt >= 2 gate) from ONE zero-Exchange pass-through Arrow stage —
    no gram shuffle, no verdict join back. Randomized-parity-tested
    against the composed path. Use this in verdict-only pipelines; use
    filter_repetition/repetition_signals when the top gram string itself
    must be reported."""
    thresholds = GOPHER_TOP_NGRAM_MAX if thresholds is None else thresholds
    dup_thresholds = (
        GOPHER_DUP_NGRAM_MAX if dup_thresholds is None else dup_thresholds
    )
    prof = repetition_profile(
        df,
        ns=tuple(sorted(thresholds)),
        dup_ns=tuple(sorted(dup_thresholds)),
        text_col=text_col,
    )
    verdict = None
    for n, thr in sorted(thresholds.items()):
        cond = (F.col(f"_top_cnt_{n}") >= 2) & (
            F.round(
                F.col(f"_top_cov_{n}").cast("double") / F.col("_rep_chars"),
                6,
            )
            > thr
        )
        branch = F.when(cond, F.lit(f"top_{n}gram"))
        verdict = branch if verdict is None else verdict.when(
            cond, F.lit(f"top_{n}gram")
        )
    for n, thr in sorted(dup_thresholds.items()):
        cond = F.round(F.col(f"_dup_frac_{n}"), 6) > thr
        branch = F.when(cond, F.lit(f"dup_{n}gram"))
        verdict = branch if verdict is None else verdict.when(
            cond, F.lit(f"dup_{n}gram")
        )
    if verdict is None:
        verdict = F.lit(None).cast("string")
    drop = ["_rep_chars"]
    drop += [f"_top_cnt_{n}" for n in thresholds]
    drop += [f"_top_cov_{n}" for n in thresholds]
    drop += [f"_dup_frac_{n}" for n in dup_thresholds]
    return prof.withColumn("rep_reject_reason", verdict).drop(*drop)


def chunk_text(
    df: DataFrame,
    size: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-size character chunks with optional
    overlap (context-window prep for training/retrieval). Chunk i covers
    [i*stride, i*stride + size) with stride = size - overlap; the last
    chunk may be shorter; empty/null text yields no chunks.

    Pure JVM: sequence + explode + substring — chunk COUNT per row is
    computed natively, the explode is row-local (no shuffle at any
    scale), and text bytes are touched exactly once at the substring.
    """
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    n_chunks = F.when(
        F.length(text_col) > 0,
        (F.floor((F.length(text_col) - 1) / stride) + 1).cast("int"),
    ).otherwise(F.lit(0))
    # drop a trailing chunk that would start past the end AND be fully
    # contained in the previous one (starts >= len are impossible by the
    # n_chunks formula except when overlap creates a start < len but the
    # previous chunk already covers to len — keep those: they carry the
    # overlap contract)
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("_t"),
            # sequence(0, -1) DESCENDS in Spark, so the empty case must be
            # an explicit empty array, not an empty range
            F.explode(
                F.when(
                    n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)
                ).otherwise(F.array().cast("array<int>"))
            ).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.substring(
                F.col("_t"), F.col("chunk_idx") * stride + 1, size
            ).alias("chunk_text"),
        )
    )


def blob_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gibberish / binary-blob quality signals per document:

    - ``base64_frac`` / ``hex_frac``: fraction of characters inside long
      base64-ish (>= 48 chars of [A-Za-z0-9+/=]) or hex-ish (>= 32 chars
      of [0-9a-fA-F]) runs — inlined keys, data-URI payloads, and dumps
      that length/word heuristics miss. Pure JVM: regexp_extract_all +
      an aggregate HOF summing match lengths (runs once per match list,
      not per char; CodegenFallback on this Spark but still JVM-side).
    - ``char_entropy``: Shannon entropy in bits/byte over the UTF-8
      encoding, a vectorized-numpy Pandas UDF (bincount per string —
      per-string Python like the MinHash shingler, the documented
      category for inherently per-string kernels). English prose sits
      ~4.1-4.7; base64 blobs ~6; repeated filler < 3.5.

    NULL text yields NULL signals (never 0 — absence, not cleanliness).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _entropy(s: pd.Series) -> pd.Series:
        out = np.full(len(s), np.nan)
        for i, t in enumerate(s):
            if t is None:
                continue
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            if len(b) == 0:
                out[i] = 0.0
                continue
            counts = np.bincount(b, minlength=256)
            p = counts[counts > 0] / len(b)
            out[i] = float(-(p * np.log2(p)).sum())
        return pd.Series(out)

    text = F.col(text_col)

    def run_frac(rx: str) -> Column:
        matched = F.aggregate(
            F.regexp_extract_all(text, F.lit(rx), F.lit(0)),
            F.lit(0),
            lambda acc, m: acc + F.length(m),
        )
        return F.when(
            text.isNotNull(),
            F.round(
                matched / F.greatest(F.length(text), F.lit(1)), 6
            ),
        )

    return df.withColumns(
        {
            "base64_frac": run_frac(r"[A-Za-z0-9+/=]{48,}"),
            "hex_frac": run_frac(r"[0-9a-fA-F]{32,}"),
            "char_entropy": F.when(
                text.isNotNull(), F.round(_entropy(text), 4)
            ),
        }
    )


def compression_signals(
    df: DataFrame, text_col: str = "text", level: int = 6
) -> DataFrame:
    """``compression_ratio`` per document: deflate(utf-8 bytes) size over
    raw size (zlib level ``level``, header+trailer included — the exact
    number any independent zlib reproduces bit-for-bit, so tests pin
    equality, not tolerance).

    The corpus-hygiene signal the entropy/repetition family can't see
    alone: duplicated-paragraph templating compresses far below prose
    (ratio < ~0.3 at a few KB), while encrypted/compressed/random blobs
    sit near or ABOVE 1.0 (deflate adds framing on incompressible input) —
    both tails are off-distribution for training text (Dolma and
    RedPajama-v2 ship the same gzip/zlib-ratio quality tag). One scalar
    Pandas UDF; zlib's C loop does the work, same per-string-kernel
    category as the MinHash shingler. NULL text -> NULL; empty text -> NULL
    (a 0-byte payload has no meaningful ratio; length gates own empties).

    Scale note: compression cost is linear in bytes with a small constant
    (~100 MB/s/core at level 6) — at 10^12 turns prefer gating it behind
    the cheap cascade stages like the repetition family, or drop
    ``level`` to 1 (~3x faster, ratios shift but order is stable).
    """
    import zlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(s: pd.Series) -> pd.Series:
        out = np.full(len(s), np.nan)
        for i, t in enumerate(s):
            if not t:  # None or empty
                continue
            b = t.encode("utf-8")
            out[i] = len(zlib.compress(b, level)) / len(b)
        return pd.Series(out)

    return df.withColumn(
        "compression_ratio",
        F.when(F.col(text_col).isNotNull(), F.round(_ratio(F.col(text_col)), 6)),
    )


def filter_compression(
    df: DataFrame,
    text_col: str = "text",
    min_ratio: float = 0.25,
    max_ratio: float = 1.05,
) -> DataFrame:
    """``comp_reject_reason`` from the compression-ratio band: below
    ``min_ratio`` -> 'comp_ratio_low' (templated/repeated filler), above
    ``max_ratio`` -> 'comp_ratio_high' (incompressible blob). NULL/empty
    text passes (absence is owned by the length gates), matching every
    other rule family's null contract."""
    out = compression_signals(df, text_col=text_col)
    r = F.col("compression_ratio")
    reason = (
        F.when(r.isNull(), F.lit(None).cast("string"))
        .when(r < min_ratio, F.lit("comp_ratio_low"))
        .when(r > max_ratio, F.lit("comp_ratio_high"))
    )
    return out.withColumn("comp_reject_reason", reason)
