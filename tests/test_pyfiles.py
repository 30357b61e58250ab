"""The --py-files archive build (tools/build_pyfiles.py).

The north rule launches jobs via ``spark-submit --py-files``; the archive
must (a) carry the full library closure and nothing else, and (b) be
byte-reproducible so a cluster that caches shipped archives by hash can
tell an unchanged library from a changed one.
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from build_pyfiles import build  # noqa: E402


def test_archive_carries_exactly_the_library(tmp_path):
    out = build(tmp_path / "lib.zip")
    names = set(zipfile.ZipFile(out).namelist())
    on_disk = {
        str(f.relative_to(REPO))
        for f in (REPO / "fineweb_legal_spark").rglob("*.py")
    }
    assert names == on_disk
    # the closure is complete: every package __init__ and submodule ships
    assert "fineweb_legal_spark/__init__.py" in names
    assert "fineweb_legal_spark/operators/__init__.py" in names
    # and nothing else leaks in (tests, jobs, tools, benchmarks)
    assert not [n for n in names if not n.startswith("fineweb_legal_spark/")]


def test_archive_is_byte_reproducible(tmp_path):
    a = build(tmp_path / "a.zip").read_bytes()
    b = build(tmp_path / "b.zip").read_bytes()
    assert a == b


def test_archive_is_importable_as_shipped(tmp_path):
    """Executors see the zip on sys.path — import the package from it the
    way a Spark worker would (zipimport), not from the repo checkout."""
    out = build(tmp_path / "ship.zip")
    import subprocess

    code = (
        "import sys; sys.path.insert(0, sys.argv[1]);\n"
        "import fineweb_legal_spark.operators.textql as t;\n"
        "assert t.__file__.startswith(sys.argv[1]), t.__file__;\n"
        "print('ok')"
    )
    r = subprocess.run(
        [sys.executable, "-c", code, str(out)],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # away from the checkout so the zip wins
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "ok"
