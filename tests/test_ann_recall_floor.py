"""Pinned recall@k floors for every ANN configuration (r4 verdict item
5): the correctness gate proves each ANN query computes exactly what it
claims, and `tools/eval_ann_recall.py` measures what that buys against
an independent exact ground truth — but neither STOPS a quantizer
change from silently trading recall for speed.  This test freezes the
measured sf0.01 recall table (k=10, 32 queries, 500 vectors, dim 64)
as per-configuration floors.

Every path is deterministic (seeded planes/centroids, hash sampling,
4-decimal rounding, vec_id tiebreaks), so the measured values are
exactly reproducible; the floors sit 0.02 below measured to absorb
only genuine cross-platform float jitter, not algorithmic regressions.
A change that LIFTS recall should update the floors upward alongside
BENCH.md's table.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.01"
K = 10
N_QUERIES = 32

# measured by tools/eval_ann_recall.py at sf0.01 (2026-08-20, round 5)
MEASURED = {
    "lsh_p6": 0.0312,
    "lsh_p8": 0.0125,
    "lsh_p8_mp4": 0.0312,
    "lsh_p8_mp8": 0.0750,
    "ivf_c16_np2": 0.2438,
    "ivf_c16_np4": 0.4031,
    "ivf_c64_np4": 0.2062,
    "ivf_c64_np8": 0.3094,
    "pq_adc": 0.1875,
    "ivf_trained_c16_np4": 0.5344,
    "ivf_trained_c64_np8": 0.5031,
}
FLOOR_SLACK = 0.02


def _exact_topk(path: str, query_ids: list[int], k: int):
    # independent ground truth: numpy all-pairs cosine straight from
    # parquet under the operators' published contract (self excluded,
    # 4-decimal rounding, vec_id tiebreak) — no engine code involved
    t = pq.read_table(path, columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    mat = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = mat / norms
    pos = {int(v): i for i, v in enumerate(ids)}
    out = {}
    for qid in query_ids:
        sims = np.round(unit @ unit[pos[qid]], 4)
        order = sorted(
            (i for i in range(len(ids)) if int(ids[i]) != qid),
            key=lambda i: (-sims[i], int(ids[i])),
        )
        out[qid] = {int(ids[i]) for i in order[:k]}
    return out


@pytest.fixture(scope="module")
def recall_table(spark):
    from fineweb_legal_spark.operators.similarity import (
        ivf_ann_topk,
        lsh_ann_topk,
        pq_ann_topk,
        train_ivf_centroids,
    )

    path = f"{SF_DIR}/embeddings.parquet"
    query_ids = list(range(N_QUERIES))
    gt = _exact_topk(path, query_ids, K)
    emb = spark.read.parquet(path)
    dim = len(emb.select("embedding").first()[0])

    methods = {
        "lsh_p6": lambda: lsh_ann_topk(emb, query_ids, K, dim, n_planes=6),
        "lsh_p8": lambda: lsh_ann_topk(emb, query_ids, K, dim, n_planes=8),
        "lsh_p8_mp4": lambda: lsh_ann_topk(
            emb, query_ids, K, dim, n_planes=8, n_probes=4
        ),
        "lsh_p8_mp8": lambda: lsh_ann_topk(
            emb, query_ids, K, dim, n_planes=8, n_probes=8
        ),
        "ivf_c16_np2": lambda: ivf_ann_topk(
            emb, query_ids, K, dim, nprobe=2, n_cells=16
        ),
        "ivf_c16_np4": lambda: ivf_ann_topk(
            emb, query_ids, K, dim, nprobe=4, n_cells=16
        ),
        "ivf_c64_np4": lambda: ivf_ann_topk(
            emb, query_ids, K, dim, nprobe=4, n_cells=64
        ),
        "ivf_c64_np8": lambda: ivf_ann_topk(
            emb, query_ids, K, dim, nprobe=8, n_cells=64
        ),
        "pq_adc": lambda: pq_ann_topk(emb, query_ids, K, dim),
    }
    for n_cells, nprobe in ((16, 4), (64, 8)):
        cents = train_ivf_centroids(emb, dim=dim, n_cells=n_cells)
        methods[f"ivf_trained_c{n_cells}_np{nprobe}"] = (
            lambda c=cents, nc=n_cells, np_=nprobe: ivf_ann_topk(
                emb, query_ids, K, dim, nprobe=np_, n_cells=nc, centroids=c
            )
        )

    got = {}
    for name, fn in methods.items():
        hits = {q: set() for q in query_ids}
        for r in fn().collect():
            hits[int(r["query_id"])].add(int(r["vec_id"]))
        got[name] = float(
            np.mean([len(hits[q] & gt[q]) / K for q in query_ids])
        )
    return got


@pytest.mark.parametrize("config", sorted(MEASURED))
def test_recall_floor(recall_table, config):
    assert recall_table[config] >= MEASURED[config] - FLOOR_SLACK, (
        f"{config} recall@{K} {recall_table[config]:.4f} fell below the "
        f"pinned floor {MEASURED[config] - FLOOR_SLACK:.4f} "
        f"(measured {MEASURED[config]:.4f}); if this change intentionally "
        "alters a quantizer, re-measure with tools/eval_ann_recall.py and "
        "update MEASURED + BENCH.md together"
    )


def test_recall_levers_still_monotonic(recall_table):
    """The documented recall levers must keep moving the metric the
    right way: multi-probe at p8, nprobe at c16, and the k-means-trained
    quantizer over seeded-gaussian cells at identical scanned budget."""
    assert recall_table["lsh_p8_mp8"] > recall_table["lsh_p8"]
    assert recall_table["ivf_c16_np4"] > recall_table["ivf_c16_np2"]
    assert (
        recall_table["ivf_trained_c16_np4"] > recall_table["ivf_c16_np4"]
    )
    assert (
        recall_table["ivf_trained_c64_np8"] > recall_table["ivf_c64_np8"]
    )
