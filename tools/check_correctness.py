"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and the matching ``oracle_sql()``
on DuckDB over the same sf-dir parquet tables, comparing row count, column
names, and an order-insensitive value hash. Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def value_hash(df: pd.DataFrame) -> str:
    if len(df) == 0:
        return hashlib.sha256(",".join(sorted(df.columns)).encode()).hexdigest()[:16]
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object or str(col.dtype).startswith("string"):
            df[c] = col.astype("string")
    rows = df.astype("string").fillna("\x00NULL")
    joined = rows.apply(lambda r: "\x1f".join(r.values.tolist()), axis=1)
    return hashlib.sha256(
        "\x1e".join(sorted(joined.tolist())).encode()
    ).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from fineweb_legal_spark.session import get_spark

    spark = get_spark(master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # a few oracles verify against golden fixtures built per scale
    # factor; when checking a non-default sf, point them at that sf's
    # goldens (tools/build_golden_misc.py <sf_dir> builds them) or fall
    # back to a rows-only check rather than a guaranteed-stale compare
    sf_name = Path(sf_dir).name
    if sf_name != "sf0.01":
        alt = Path(__file__).resolve().parent.parent / "data" / "golden" / sf_name
        for name, sql in list(oracles.items()):
            if "golden/sf0.01" in sql:
                if alt.exists():
                    oracles[name] = sql.replace("golden/sf0.01", f"golden/{sf_name}")
                else:
                    del oracles[name]
                    print(f"NOTE {name}: sf0.01-pinned golden, rows-only at {sf_name}")
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {e}")
            failures.append(name)
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(got)} rows in {el:.1f}s")
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {e}")
            failures.append(name)
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        if not problems:
            hg, hw = value_hash(got), value_hash(want)
            if hg != hw:
                problems.append("value-hash mismatch")
                m = got.sort_values(sorted(got.columns)[:2]).reset_index(drop=True)
                w = want.sort_values(sorted(want.columns)[:2]).reset_index(drop=True)
                print(m.head(3).to_string(), "\n--vs--\n", w.head(3).to_string())
        status = "OK  " if not problems else "FAIL"
        print(f"{status} {name}: {len(got)} rows in {el:.1f}s {'; '.join(problems)}")
        if problems:
            failures.append(name)
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
