"""Brute-force near-dup goldens for the t1 transcripts tier.

Independent of the Spark operators' join/band machinery: enumerates ALL
pairs with numpy (the LSH paths must reproduce these sets exactly at the
chosen thresholds — MinHash by overwhelming detection probability at
j >= 0.9 with 32x2 banding, SimHash by pigeonhole guarantee at d <= 3 with
4x16-bit chunks).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fineweb_legal_spark.datasets import DATA_DIR, ensure_transcripts  # noqa: E402
from fineweb_legal_spark.operators.dedup import (  # noqa: E402
    jaccard,
    simhash64,
    word_shingles,
)

MINHASH_THRESHOLD = 0.9
SIMHASH_MAX_HAMMING = 3


def turn_id(conv_id: str, turn_idx: int) -> str:
    return f"{conv_id}#{turn_idx:06d}"


def main() -> None:
    src = pq.read_table(ensure_transcripts("t1")).to_pandas()
    src = src[src["text"].notna()].reset_index(drop=True)
    ids = [turn_id(c, t) for c, t in zip(src["conv_id"], src["turn_idx"])]
    texts = list(src["text"])

    shingles = [word_shingles(t) for t in texts]
    n = len(ids)
    mh_rows = {"id_a": [], "id_b": [], "jaccard": []}
    for i in range(n):
        si = shingles[i]
        for k in range(i + 1, n):
            j = jaccard(si, shingles[k])
            if j >= MINHASH_THRESHOLD:
                a, b = sorted((ids[i], ids[k]))
                mh_rows["id_a"].append(a)
                mh_rows["id_b"].append(b)
                mh_rows["jaccard"].append(round(j, 4))
    mh = pd.DataFrame(mh_rows).sort_values(["id_a", "id_b"]).reset_index(drop=True)

    sigs = np.array([simhash64(t) for t in texts], dtype=np.int64).view(np.uint64)
    sh_rows = {"id_a": [], "id_b": [], "hamming": []}
    for i in range(n):
        d = np.bitwise_xor(sigs[i], sigs[i + 1 :])
        # vectorized popcount
        cnt = np.zeros(d.shape, dtype=np.int64)
        v = d.copy()
        while v.any():
            cnt += (v & np.uint64(1)).astype(np.int64)
            v >>= np.uint64(1)
        for off in np.nonzero(cnt <= SIMHASH_MAX_HAMMING)[0]:
            k = i + 1 + int(off)
            a, b = sorted((ids[i], ids[k]))
            sh_rows["id_a"].append(a)
            sh_rows["id_b"].append(b)
            sh_rows["hamming"].append(int(cnt[off]))
    sh = pd.DataFrame(sh_rows).sort_values(["id_a", "id_b"]).reset_index(drop=True)

    out = DATA_DIR / "golden" / "t1"
    out.mkdir(parents=True, exist_ok=True)
    mh.to_parquet(out / "neardup_minhash.parquet", index=False)
    sh.to_parquet(out / "neardup_simhash.parquet", index=False)
    print(f"minhash pairs (j>={MINHASH_THRESHOLD}): {len(mh)}")
    print(f"simhash pairs (d<={SIMHASH_MAX_HAMMING}): {len(sh)}")


if __name__ == "__main__":
    main()
