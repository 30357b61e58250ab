"""BPE tokenizer training + encoding (operators/bpe.py).

The correctness reference for the incremental trainer is a naive
recount-every-iteration implementation kept HERE (quadratic, obviously
right); the distributed word-count stage gets a DuckDB twin.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from fineweb_legal_spark.operators import bpe


def naive_learn_merges(counts: dict[str, int], num_merges: int):
    """Recount-everything BPE (Sennrich et al. 2016 fig. 1 semantics,
    same (count desc, pair asc) tie-break)."""
    words = {bpe._segment(w): c for w, c in counts.items()}
    merges = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in words.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        merges.append(best)
        joined = best[0] + best[1]
        new_words = {}
        for syms, c in words.items():
            out = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(joined)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + c
        words = new_words
    return merges


CORPUS = [
    ("d1", "the lower the newer the wider"),
    ("d2", "low lower lowest new newer newest"),
    ("d3", "wide wider widest low low low"),
    ("d4", "newer methods lower costs, wider reach."),
    ("d5", None),
    ("d6", "  "),
]


def test_learn_merges_matches_naive_reference():
    counts = {
        "low": 5, "lower": 2, "newest": 6, "widest": 3,
        "aaa": 4, "aab": 2, "ba": 7, "b": 1,
    }
    for k in (0, 1, 5, 20, 200):
        assert bpe.learn_merges(dict(counts), k) == naive_learn_merges(counts, k)


def test_train_bpe_partition_invariant(spark):
    df = spark.createDataFrame(CORPUS, "doc_id string, text string")
    m1 = bpe.train_bpe(df.repartition(1), num_merges=30)
    m7 = bpe.train_bpe(df.repartition(7), num_merges=30)
    assert m1.merges == m7.merges
    assert len(m1.merges) > 0


def test_word_counts_duckdb_twin(spark):
    df = spark.createDataFrame(CORPUS, "doc_id string, text string")
    got = (
        bpe.word_counts(df)
        .toPandas()
        .sort_values(["word"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(CORPUS, columns=["doc_id", "text"]))
    want = con.execute(
        """
        SELECT word, COUNT(*)::BIGINT AS n FROM (
          SELECT unnest(regexp_split_to_array(lower(text),
                        '[ \t\n\r\f\x0b]+')) AS word
          FROM docs WHERE text IS NOT NULL
        ) WHERE word != '' GROUP BY word ORDER BY word
        """
    ).df()
    assert got["word"].tolist() == want["word"].tolist()
    assert got["n"].tolist() == want["n"].tolist()


def test_word_counts_cap_is_top_by_count_then_word(spark):
    df = spark.createDataFrame(CORPUS, "doc_id string, text string")
    full = bpe.word_counts(df).toPandas()
    top3 = bpe.word_counts(df, max_word_types=3).toPandas()
    want = full.sort_values(["n", "word"], ascending=[False, True]).head(3)
    assert sorted(top3["word"]) == sorted(want["word"])


def test_encode_roundtrip_and_zero_merges(spark):
    df = spark.createDataFrame(CORPUS, "doc_id string, text string")
    model = bpe.train_bpe(df, num_merges=25)
    enc = bpe.encode_bpe(df, model).toPandas().set_index("doc_id")
    # round-trip: token concatenation reproduces the normalized words
    for doc_id, text in CORPUS:
        toks = enc.loc[doc_id, "tokens"]
        if text is None or not text.strip():
            assert len(toks) == 0
            continue
        rebuilt = "".join(toks).split(bpe.EOW)[:-1]
        assert rebuilt == [w for w in text.lower().split() if w]
        assert enc.loc[doc_id, "n_tokens"] == len(toks)
    # zero merges -> pure character segmentation
    chars = bpe.encode_bpe(df, bpe.BpeModel(()), id_col="doc_id").toPandas()
    row = chars.set_index("doc_id").loc["d2", "tokens"]
    assert list(row[:3]) == ["l", "o", "w" + bpe.EOW]


def test_merges_table_round_trip(spark):
    df = spark.createDataFrame(CORPUS, "doc_id string, text string")
    model = bpe.train_bpe(df, num_merges=10)
    back = bpe.model_from_table(bpe.merges_table(spark, model))
    assert back == model


def test_encode_word_matches_training_segmentation():
    # applying ranks greedily must reproduce the trainer's final
    # segmentation of every training word
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe.learn_merges(dict(counts), 50)
    ranks = {p: r for r, p in enumerate(merges)}
    # recompute training-side segmentation naively
    words = {w: list(bpe._segment(w)) for w in counts}
    for a, b in merges:
        for w, syms in words.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == (a, b):
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[w] = out
    for w in counts:
        assert bpe.encode_word(w, ranks) == words[w], w


@pytest.mark.parametrize("seed", range(4))
def test_learn_merges_fuzz_against_naive(seed):
    import random

    rng = random.Random(seed)
    alphabet = "abcd"
    counts = {}
    for _ in range(30):
        w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
        counts[w] = counts.get(w, 0) + rng.randint(1, 9)
    k = rng.randint(1, 40)
    assert bpe.learn_merges(dict(counts), k) == naive_learn_merges(counts, k)


def test_tokenizer_stats_totals(spark):
    df = spark.createDataFrame(CORPUS, "doc_id string, text string")
    model = bpe.train_bpe(df, num_merges=25)
    row = bpe.tokenizer_stats(df, model).collect()[0]
    # independent recount: totals over non-null, non-empty docs
    ranks = model.ranks()
    toks = words = nbytes = 0
    for _, text in CORPUS:
        if text is None:
            continue
        nbytes += len(text.encode("utf-8"))  # raw corpus bytes, not lowered
        for w in text.lower().split():
            words += 1
            toks += len(bpe.encode_word(w, ranks))
    assert row["tokens"] == toks
    assert row["words"] == words
    assert row["bytes"] == nbytes
    assert row["fertility"] == pytest.approx(toks / words)
    assert row["bytes_per_token"] == pytest.approx(nbytes / toks)
    # merged vocab strictly beats character segmentation
    assert row["fertility"] < sum(
        len(w) for _, t in CORPUS if t for w in t.lower().split()
    ) / words
