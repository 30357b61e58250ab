"""In-engine embeddings: Spark == single-process twin, partition
invariance, and the bag-cosine geometry the downstream ANN/semantic-dedup
family relies on."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from fineweb_legal_spark.operators.embed import embed_docs, embed_texts_numpy


def test_spark_matches_twin_and_partition_invariant(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pdf = docs.select("doc_id", "text").toPandas().sort_values("doc_id")
    want = embed_texts_numpy(list(pdf["text"]), dim=64, vocab_bits=18, seed=1)

    for parts in (1, 7):
        got_rows = {
            r.id: np.array(r.emb, dtype=np.float32)
            for r in embed_docs(docs.repartition(parts), dim=64).collect()
        }
        got = np.stack([got_rows[i] for i in pdf["doc_id"]])
        assert np.allclose(got, want, atol=1e-6)


def test_bag_cosine_geometry(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "zeta epsilon delta gamma beta alpha"),   # same bag, reordered
        (3, "alpha beta gamma delta epsilon zeta eta"),  # near-dup
        (4, "one two three four five six seven eight"),  # disjoint vocab
        (5, None),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    emb = {r.id: np.array(r.emb) for r in embed_docs(df, dim=128).collect()}

    def cos(a, b):
        return float(emb[a] @ emb[b])

    assert cos(1, 2) > 0.999          # bag model: order-invariant
    assert cos(1, 3) > 0.9            # near-dup stays close
    assert abs(cos(1, 4)) < 0.45      # disjoint bags ~orthogonal (JL noise)
    assert cos(1, 3) > cos(1, 4)
    assert not emb[5].any() and not emb[6].any()  # null/empty -> zeros
    for i in (1, 2, 3, 4):
        assert abs(np.linalg.norm(emb[i]) - 1.0) < 1e-5


def test_embed_feeds_semantic_dedup(spark):
    """Composition: in-engine embeddings + semantic_dedup must cluster
    planted exact/near duplicates together and keep exactly one
    representative, leaving unrelated docs as kept singletons."""
    from fineweb_legal_spark.operators.cluster import semantic_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    dups = docs.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 100_000).alias("doc_id"), "text"
    )
    corpus = docs.select("doc_id", "text").unionByName(dups)
    emb = embed_docs(corpus, dim=64).select(
        F.col("id").alias("vec_id"), F.col("emb").alias("embedding")
    )
    labels = {
        r.vec_id: (r.cluster_id, r.keep)
        for r in semantic_dedup(emb, dim=64, threshold=0.95, n_planes=4).collect()
    }
    for i in range(5):
        # planted twin shares the original's cluster; the min id is kept
        assert labels[i][0] == labels[i + 100_000][0]
        assert labels[i][1] is True and labels[i + 100_000][1] is False
    kept = sum(1 for _, k in labels.values() if k)
    clusters = len({c for c, _ in labels.values()})
    # one keeper per cluster; the corpus itself may contain real near-dups
    # (synthetic docs share templates), so clusters <= 60, never more
    assert kept == clusters
    assert 50 <= clusters <= 60
