"""Chunked-tier generation (datasets.CHUNKED_TIERS): resumability,
determinism, and chunk disjointness — the properties the 10M-turn
``bench10`` linearity tier depends on.  Runs on a tiny injected tier so
the test never generates real bench-scale data."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq
import pytest

from fineweb_legal_spark import datasets


@pytest.fixture()
def tiny_tier(tmp_path, monkeypatch):
    monkeypatch.setattr(datasets, "DATA_DIR", tmp_path)
    monkeypatch.setitem(datasets.CHUNKED_TIERS, "tinychunk", (3, 400))
    yield "tinychunk"
    datasets.CHUNKED_TIERS.pop("tinychunk", None)


def _read_all(path) -> pd.DataFrame:
    df = pq.read_table(path).to_pandas()
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_chunked_tier_generates_all_chunks(tiny_tier):
    p = datasets.ensure_transcripts(tiny_tier)
    assert (p / "_SUCCESS").exists()
    df = _read_all(p)
    # ~400 rows per chunk (generator rounds to conversation sizes)
    assert 3 * 300 <= len(df) <= 3 * 500
    # every chunk contributed, and conv_ids never cross chunks
    prefixes = {c.split("_", 1)[0] for c in df["conv_id"]}
    assert prefixes == {"g0", "g1", "g2"}
    # schema matches the plain tiers exactly
    t1 = datasets.ensure_transcripts("t1")
    assert pq.read_schema(p / sorted(x.name for x in p.glob("*.parquet"))[0]).names == pq.read_schema(t1).names


def test_chunked_tier_is_resumable_and_deterministic(tiny_tier, tmp_path):
    p = datasets.ensure_transcripts(tiny_tier)
    full = _read_all(p)

    # simulate a mid-generation kill: drop _SUCCESS and chunk 2's marker
    # plus its files; re-run must regenerate ONLY chunk 2, byte-identical
    (p / "_SUCCESS").unlink()
    (p / "_CHUNK_002").unlink()
    for f in p.glob("part_002_*.parquet"):
        f.unlink()
    kept_mtime = {f.name: f.stat().st_mtime_ns for f in p.glob("part_000_*.parquet")}

    p2 = datasets.ensure_transcripts(tiny_tier)
    assert p2 == p and (p / "_SUCCESS").exists()
    resumed = _read_all(p)
    pd.testing.assert_frame_equal(full, resumed)
    # chunks 0/1 were not rewritten (resume skipped committed chunks)
    assert {f.name: f.stat().st_mtime_ns for f in p.glob("part_000_*.parquet")} == kept_mtime
