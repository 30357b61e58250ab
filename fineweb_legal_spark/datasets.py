"""Materialize the deterministic synthetic tables + golden fixtures to disk.

Tiers per FIXTURES.md: t1 smoke (~2k turns), t2 correctness (~60k turns),
bench (~2M turns, generated lazily, gitignored). Golden verdicts come from
the single-node oracle. Files are content-addressed by (tier, seed) and
cached; regeneration is idempotent and byte-stable.
"""

from __future__ import annotations

import os
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

REPO_ROOT = Path(__file__).resolve().parent.parent
DATA_DIR = Path(os.environ.get("FINEWEB_SPARK_DATA", REPO_ROOT / "data"))

TIERS = {"t1": 2_000, "t2": 60_000, "bench": 2_000_000}
SEED = 42

# Chunked tiers exist for DATA-SIZE linearity evidence (BENCH.md): the same
# pipeline at 1x and 5x the bench rows should show flat per-turn throughput
# if the plan has no super-linear stage. tier -> (n_chunks, rows_per_chunk).
# Each chunk uses a DISTINCT seed (chunks are not byte-duplicates, so the
# dedup rate stays realistic instead of collapsing 80% of turns into losers)
# and a conv_id prefix (conversations never merge across chunks).
CHUNKED_TIERS = {"bench10": (5, 2_000_000)}


def transcripts_path(tier: str) -> Path:
    if tier == "bench" or tier in CHUNKED_TIERS:
        # directory of files so the Spark scan splits across executors
        return DATA_DIR / "transcripts" / tier
    return DATA_DIR / "transcripts" / tier / "transcripts.parquet"


def golden_path(tier: str) -> Path:
    return DATA_DIR / "golden" / tier / "golden_verdicts.parquet"


def webdocs_path(tier: str) -> Path:
    return DATA_DIR / "webdocs" / tier / "webdocs.parquet"


def web_golden_path(tier: str) -> Path:
    return DATA_DIR / "golden" / tier / "golden_web_keep.parquet"


def _write(df, path: Path, schema: pa.Schema | None = None) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    table = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    tmp = path.with_suffix(".tmp")
    pq.write_table(table, tmp, compression="snappy")
    os.replace(tmp, path)  # atomic publish (reference storage.py:220-235 analog)


_TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def _write_parts(df, dest: Path, stem: str, n_files: int = 64) -> None:
    chunk = (len(df) + n_files - 1) // n_files
    for i in range(n_files):
        part = df.iloc[i * chunk : (i + 1) * chunk]
        if len(part):
            _write(part, dest / f"{stem}_{i:05d}.parquet", _TRANSCRIPT_SCHEMA)


def ensure_transcripts(tier: str) -> Path:
    p = transcripts_path(tier)
    if tier in CHUNKED_TIERS:
        done = p / "_SUCCESS"
        if not done.exists():
            from .generator import generate_transcripts

            n_chunks, chunk_rows = CHUNKED_TIERS[tier]
            for c in range(n_chunks):
                marker = p / f"_CHUNK_{c:03d}"
                if marker.exists():  # resumable: ~2 min/chunk of driver time
                    continue
                df = generate_transcripts(chunk_rows, seed=SEED + 1_000 + c)
                df["conv_id"] = f"g{c}_" + df["conv_id"]
                df["ts"] = df["ts"].astype("datetime64[us]")
                p.mkdir(parents=True, exist_ok=True)
                _write_parts(df, p, f"part_{c:03d}")
                marker.touch()
            done.touch()
        return p
    if tier == "bench":
        done = p / "_SUCCESS"
        if not done.exists():
            from .generator import generate_transcripts

            df = generate_transcripts(TIERS[tier], seed=SEED)
            df["ts"] = df["ts"].astype("datetime64[us]")
            _write_parts(df, p, "part")
            done.touch()
        return p
    if not p.exists():
        from .generator import generate_transcripts

        df = generate_transcripts(TIERS[tier], seed=SEED)
        df["ts"] = df["ts"].astype("datetime64[us]")
        _write(df, p, _TRANSCRIPT_SCHEMA)
    return p


def ensure_golden(tier: str) -> Path:
    p = golden_path(tier)
    if not p.exists():
        import pandas as pd

        from .oracle import oracle_verdicts

        src = pq.read_table(ensure_transcripts(tier)).to_pandas(types_mapper=None)
        # preserve nulls as None for oracle
        src["text"] = src["text"].astype("string")
        src["conv_id"] = src["conv_id"].astype("string")
        verdicts = oracle_verdicts(src)
        schema = pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("keep", pa.bool_()),
                ("reject_reason", pa.string()),
                ("scrubbed_text", pa.string()),
                ("lang", pa.string()),
                ("ppl_bucket", pa.int32()),
            ]
        )
        _write(verdicts, p, schema)
        _ = pd  # keep import local
    return p


def ensure_webdocs(tier: str) -> Path:
    p = webdocs_path(tier)
    if not p.exists():
        from .generator import generate_webdocs

        n = {"t1": 400, "t2": 4_000, "bench": 100_000}[tier]
        _write(generate_webdocs(n, seed=SEED + 1), p)
    return p


def media_path(tier: str) -> Path:
    return DATA_DIR / "media" / tier / "media.parquet"


def ensure_media(tier: str) -> Path:
    p = media_path(tier)
    if not p.exists():
        from .operators.multimodal import generate_media

        n = {"t1": 200, "t2": 2_000, "bench": 20_000}[tier]
        df = generate_media(n, seed=SEED + 2)
        schema = pa.schema(
            [
                ("media_id", pa.int64()),
                ("kind", pa.string()),
                ("meta", pa.string()),
                ("payload", pa.binary()),
            ]
        )
        _write(df, p, schema)
    return p


def ensure_planes(dim: int, n_planes: int | None = None) -> Path:
    """Export the LSH hyperplane matrix as parquet so the DuckDB oracle can
    recompute bucket assignments independently (data, not shared code).
    One file per (dim, n_planes) configuration; the default keeps the
    round-1 name so existing goldens stay addressed."""
    suffix = "" if n_planes is None else f"_p{n_planes}"
    p = DATA_DIR / "golden" / f"planes_dim{dim}{suffix}.parquet"
    if not p.exists():
        import pandas as pd

        from .operators.similarity import N_PLANES, planes_for

        mat = planes_for(dim, n_planes if n_planes is not None else N_PLANES)
        df = pd.DataFrame(
            {
                "plane_idx": list(range(mat.shape[0])),
                "weights": [row.tolist() for row in mat],
            }
        )
        _write(df, p)
    return p


def ensure_ivf_centroids(dim: int, n_cells: int | None = None) -> Path:
    """Export the IVF coarse-quantizer centroids as parquet so the DuckDB
    oracle can recompute cell assignment + probing independently. One file
    per (dim, n_cells) configuration."""
    suffix = "" if n_cells is None else f"_c{n_cells}"
    p = DATA_DIR / "golden" / f"ivf_centroids_dim{dim}{suffix}.parquet"
    if not p.exists():
        import pandas as pd

        from .operators.similarity import N_IVF_CELLS, ivf_centroids

        mat = ivf_centroids(dim, n_cells if n_cells is not None else N_IVF_CELLS)
        df = pd.DataFrame(
            {
                "cell_idx": list(range(mat.shape[0])),
                "weights": [row.tolist() for row in mat],
            }
        )
        _write(df, p)
    return p


def ensure_web_golden(tier: str) -> Path:
    p = web_golden_path(tier)
    if not p.exists():
        from .oracle import oracle_web_keep

        src = pq.read_table(ensure_webdocs(tier)).to_pandas()
        src["text"] = src["text"].astype("string")
        src["url"] = src["url"].astype("string")
        _write(oracle_web_keep(src), p)
    return p


def ensure_pq_codebooks(dim: int) -> Path:
    """Export the PQ codebooks as (m, code, weights) parquet so the DuckDB
    oracle can replay encode + ADC + re-rank independently in pure SQL."""
    p = DATA_DIR / "golden" / f"pq_codebooks_dim{dim}.parquet"
    if not p.exists():
        import pandas as pd

        from .operators.similarity import pq_codebooks

        cb = pq_codebooks(dim)  # (M, K, dsub)
        rows = {
            "m": [], "code": [], "weights": [],
        }
        for m in range(cb.shape[0]):
            for c in range(cb.shape[1]):
                rows["m"].append(m)
                rows["code"].append(c)
                rows["weights"].append(cb[m, c].tolist())
        _write(pd.DataFrame(rows), p)
    return p
