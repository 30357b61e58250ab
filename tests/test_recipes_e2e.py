"""End-to-end composition tests: the docs/RECIPES.md chains, executed.

Each stage of the engine is unit-verified elsewhere; what these tests pin
is COMPOSITION — that the stages a user would actually chain accept each
other's output schemas and preserve the cross-stage invariants (prefix
property through truncation, coverage through packing, determinism
through mixture, one-keeper-per-cluster through dedup). A user of the
reference runs exactly these chains; a schema drift in any stage breaks
here first."""

from __future__ import annotations

import re

import pyspark.sql.functions as F


def test_transcript_hygiene_to_shards_e2e(spark, t1_transcripts, tmp_path):
    """RECIPES §2 + §5: retry-drop → episodes → protocol repair → role
    coalesce → pseudonymize → token truncate → pack → sft → shards."""
    from fineweb_legal_spark.operators.packing import pack_turns
    from fineweb_legal_spark.operators.pseudonymize import pseudonymize_pii
    from fineweb_legal_spark.operators.repairs import (
        coerce_roles,
        drop_retry_duplicates,
        repair_protocol,
        split_episodes,
    )
    from fineweb_legal_spark.operators.sft import sft_pairs
    from fineweb_legal_spark.sources.shards import assign_token_shards

    t0 = t1_transcripts
    n0 = t0.count()

    # retry artifacts first (before role-coalescing merges them)
    t = drop_retry_duplicates(t0)
    assert t.count() <= n0
    w_pairs = t.select(
        "conv_id",
        "turn_idx",
        F.lag("role").over(_w()).eqNullSafe(F.col("role")).alias("same_role"),
        F.lag("text").over(_w()).eqNullSafe(F.col("text")).alias("same_text"),
    )
    assert w_pairs.filter(F.col("same_role") & F.col("same_text")).count() == 0

    # episode boundaries while ts is still in the frame; fold the episode
    # into the conversation key so later per-conv stages respect it
    t = split_episodes(t, gap_s=3600)
    assert t.filter(F.col("episode_idx") < 0).count() == 0
    t = t.withColumn(
        "conv_id", F.concat("conv_id", F.lit("#"), F.col("episode_idx"))
    )

    # protocol repair: output renames to new_idx; rename back for the
    # next per-conversation stage
    t = repair_protocol(t)
    t = t.select("conv_id", F.col("new_idx").alias("turn_idx"), "role", "text")
    first_roles = (
        t.withColumn("_r1", F.first("role").over(_w()))
        .select("conv_id", "_r1")
        .distinct()
    )
    bad_first = first_roles.filter(~F.col("_r1").isin("system", "user"))
    assert bad_first.count() == 0
    # dense renumber: per conversation, max index + 1 == count
    dense = t.groupBy("conv_id").agg(
        (F.max("turn_idx") + 1 == F.count(F.lit(1))).alias("ok")
    )
    assert dense.filter(~F.col("ok")).count() == 0

    t = coerce_roles(t)
    t = t.select("conv_id", F.col("new_idx").alias("turn_idx"), "role", "text")
    runs = t.select(
        (F.lag("role").over(_w()).eqNullSafe(F.col("role"))).alias("same")
    )
    assert runs.filter("same").count() == 0

    scrubbed = pseudonymize_pii(t)
    assert scrubbed.count() == t.count()
    leaked = scrubbed.filter(
        F.col("text").rlike(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    )
    assert leaked.count() == 0

    from fineweb_legal_spark.operators.repairs import (
        truncate_conversation_tokens,
    )

    BUDGET = 512
    kept = truncate_conversation_tokens(scrubbed, BUDGET)
    assert kept.filter(F.col("cum_tok") > BUDGET).count() == 0
    # prefix property: kept turn indices are dense from 0 per conversation
    pref = kept.groupBy("conv_id").agg(
        (F.max("turn_idx") + 1 == F.count(F.lit(1))).alias("ok"),
        F.min("turn_idx").alias("lo"),
    )
    assert pref.filter(~F.col("ok") | (F.col("lo") != 0)).count() == 0

    # pack: chunks within budget (except oversized singletons) and every
    # kept turn in exactly one chunk
    packed = pack_turns(kept, budget=128)
    over = packed.filter((F.col("tokens") > 128) & (F.col("n_turns") > 1))
    assert over.count() == 0
    assert (
        packed.agg(F.sum("n_turns")).collect()[0][0] == kept.count()
    )

    # sft pairs target only assistant turns, context bounded
    pairs = sft_pairs(kept.select("conv_id", "turn_idx", "role", "text"), 4)
    assert pairs.filter(F.col("n_context") > 4).count() == 0
    n_assist = kept.filter(F.col("role") == "assistant").count()
    assert pairs.count() == n_assist

    # shards: every conversation-turn assigned exactly once; shard token
    # sums within budget except oversized single docs
    turns = kept.withColumn(
        "tid", F.concat("conv_id", F.lit("|"), F.col("turn_idx"))
    )
    sh = assign_token_shards(turns, budget=4000, id_col="tid")
    assert sh.count() == turns.count()
    # shard = floor(start offset / budget): every document STARTS inside
    # its shard window (only the last doc of a shard may straddle out)
    misplaced = sh.filter(F.floor(F.col("start_tok") / 4000) != F.col("shard_id"))
    assert misplaced.count() == 0
    # and offsets are a true prefix sum: total tokens == last start + last tok
    toks = turns.select(
        F.concat("conv_id", F.lit("|"), F.col("turn_idx")).alias("doc_id"),
        F.greatest(
            F.lit(1), F.floor(F.length(F.coalesce("text", F.lit(""))) / 4)
        ).alias("tok"),
    )
    j = sh.join(toks, "doc_id")
    row = j.agg(
        F.sum("tok").alias("total"),
        F.max(F.col("start_tok") + F.col("tok")).alias("end"),
    ).collect()[0]
    assert row.total == row.end


def test_docs_curation_and_dedup_e2e(spark):
    """RECIPES §3 + §4: clean → boilerplate strip → decontaminate →
    near-dup cluster → best-quality keeper → temperature mixture; the
    chain is deterministic end to end (second run = same kept set)."""
    from fineweb_legal_spark.operators.boilerplate import strip_common_lines
    from fineweb_legal_spark.operators.cluster import (
        cluster_representatives,
        connected_components,
    )
    from fineweb_legal_spark.operators.decontam import decontaminate
    from fineweb_legal_spark.operators.dedup import minhash_neardup_pairs
    from fineweb_legal_spark.operators.mixture import temperature_mixture
    from fineweb_legal_spark.operators.textclean import clean_web_text
    from fineweb_legal_spark.operators.textql import quality_score

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def run_chain():
        d = clean_web_text(docs)
        assert d.filter(F.col("clean_text_removed") < 0).count() == 0
        d = d.select("doc_id", F.col("clean_text").alias("text"), "lang", "source")

        d2 = strip_common_lines(d, min_docs=0.5).select(
            F.col("id").alias("doc_id"), F.col("clean_text").alias("text")
        )
        d = d.select("doc_id", "lang", "source").join(d2, "doc_id")

        # benchmark = a tiny slice of the corpus itself → those docs (and
        # any doc sharing an 8-gram with them) must come out contaminated
        bench = docs.filter(F.col("doc_id") % 97 == 0).select(
            F.col("doc_id").alias("doc_id"), "text"
        )
        flags = decontaminate(
            docs.select("doc_id", "text"), bench, n=8
        )
        self_hits = flags.join(bench.select("doc_id"), "doc_id").filter(
            ~F.col("contaminated")
        )
        assert self_hits.count() == 0
        d = d.join(flags.filter(~F.col("contaminated")).select("doc_id"), "doc_id")

        # near-dup clusters → keep the best-quality member per cluster
        pairs = minhash_neardup_pairs(
            d.select(F.col("doc_id").cast("string").alias("id"), "text"),
            threshold=0.8,
        )
        labels = connected_components(pairs.select("id_a", "id_b"))
        scored = quality_score(
            d.select(F.col("doc_id").cast("string").alias("id"), "text")
        ).select("id", F.col("quality_score").alias("score"))
        keepers = cluster_representatives(labels, scored)
        losers = labels.join(
            keepers.withColumnRenamed("keep_id", "id"),
            ["cluster_id", "id"],
            "left_anti",
        ).select(F.col("id").cast("long").alias("doc_id"))
        d = d.join(losers, "doc_id", "left_anti")

        # every cluster contributes exactly one surviving member
        surv = labels.join(
            d.select(F.col("doc_id").cast("string").alias("id")), "id"
        ).groupBy("cluster_id").count()
        assert surv.filter(F.col("count") != 1).count() == 0

        d = temperature_mixture(d, alpha=0.5, key_col="doc_id")
        return sorted(r.doc_id for r in d.select("doc_id").collect())

    first = run_chain()
    second = run_chain()
    assert first == second
    assert 0 < len(first) < docs.count()


def _w():
    from pyspark.sql import Window

    return Window.partitionBy("conv_id").orderBy("turn_idx")


def test_tokenizer_to_shards_e2e(spark):
    """RECIPES §5 tokenizer chain: train BPE on the corpus → publish the
    merges as data → encode → shard on REAL token counts. Pins that
    encode_bpe's output schema feeds assign_token_shards(tok_col=...) and
    that every shard except the last respects the token budget."""
    from fineweb_legal_spark.operators.bpe import (
        encode_bpe,
        merges_table,
        model_from_table,
        train_bpe,
    )
    from fineweb_legal_spark.sources.shards import assign_token_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = train_bpe(docs, num_merges=200, max_word_types=5000)
    # the synthetic corpus has a small closed vocabulary: merges EXHAUST
    # (every word fully merged) before the 200 budget — itself a useful
    # pin that the trainer stops rather than looping on zero counts
    assert 0 < len(model.merges) <= 200

    # round-trip through the publishable artifact form
    model = model_from_table(merges_table(spark, model))

    enc = encode_bpe(docs, model)
    counts = enc.select("doc_id", "n_tokens")
    joined = docs.select("doc_id").join(counts, "doc_id")
    budget = 5_000
    shards = assign_token_shards(joined, budget=budget, tok_col="n_tokens")

    rows = (
        shards.join(counts, "doc_id")
        .orderBy("start_tok")
        .select("doc_id", "shard_id", "start_tok", "n_tokens")
        .collect()
    )
    # shard contract: shard = cumulative start position // budget, and the
    # start positions are the exact running sum of the REAL token counts
    run = 0
    for r in rows:
        assert r["start_tok"] == run
        assert r["shard_id"] == run // budget
        run += r["n_tokens"]
    assert rows[-1]["shard_id"] >= 2  # real counts actually filled shards
    # every doc landed in exactly one shard
    assert shards.count() == docs.count()
    assert shards.select("doc_id").distinct().count() == docs.count()


def test_catalog_chain_e2e(spark, t1_transcripts, t1_golden):
    """RECIPES §1b: filter to catalog tables -> card over the committed
    table (the table-native job chain, exercised at the library level)."""
    from fineweb_legal_spark.lineage_table import (
        read_committed_table,
        run_with_lineage_table,
    )
    from fineweb_legal_spark.report import corpus_report

    for t in ("rec_data", "rec_lineage"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        run_with_lineage_table(
            spark, t1_transcripts, "rec_data", "rec_lineage", n_groups=2
        )
        committed = read_committed_table(spark, "rec_data", "rec_lineage")
        card = corpus_report(committed)
        kept_gold = int(t1_golden.keep.sum())
        # committed (kept-only) output -> the degraded card: every row
        # kept, turn count exactly the golden kept set
        assert card["turns"] == kept_gold
        assert card["kept_turns"] == kept_gold
        assert card["kept_frac"] == 1.0
        assert card["verdicts_present"] is False
        assert card["lang_mix"].get("en") == kept_gold
    finally:
        for t in ("rec_data", "rec_lineage"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
