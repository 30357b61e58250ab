"""Build the --py-files archive the jobs/ entry points document.

    python tools/build_pyfiles.py [dest.zip]    # default dist/fineweb_legal_spark.zip
    spark-submit --py-files dist/fineweb_legal_spark.zip jobs/run_filter.py ...

The archive carries ONLY the library (`fineweb_legal_spark/**/*.py`) —
jobs are submitted as the primary file, tests/benchmarks never ship to
executors, and the model artifacts are built in-code from constants
(`artifacts.build_artifacts`), so the zip is the complete executor-side
dependency closure.  The build is reproducible: entries are added in
sorted order with a fixed timestamp, so the same tree always produces a
byte-identical archive (a re-submit with an unchanged library is
detectable by file hash, which matters when clusters cache shipped
archives by name).
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "fineweb_legal_spark"
EPOCH = (1980, 1, 1, 0, 0, 0)  # zip format's minimum timestamp


def build(dest: Path) -> Path:
    dest.parent.mkdir(parents=True, exist_ok=True)
    tmp = dest.with_suffix(".zip.tmp")
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for f in sorted(PKG.rglob("*.py")):
            arcname = str(f.relative_to(REPO))
            info = zipfile.ZipInfo(arcname, date_time=EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, f.read_bytes())
    tmp.replace(dest)  # atomic publish, same discipline as the data sinks
    return dest


def main() -> None:
    dest = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "dist" / "fineweb_legal_spark.zip"
    out = build(dest)
    n = len(zipfile.ZipFile(out).namelist())
    print(f"{out} ({n} modules, {out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
