"""Local replica of the driver's correctness gate.

Runs every queries() entry at a given sf dir and compares it with the
matching oracle_sql() via DuckDB: row count, column-name set, and an
order-insensitive value hash (columns sorted by name, rows sorted by all
columns, values stringified).  Usage:

    PYTHONPATH=/root/repo python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.astype(str)
        elif np.issubdtype(col.dtype, np.floating):
            df[c] = col.map(lambda x: f"{x:.9g}")
        else:
            df[c] = col.astype(str)
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    h = hashlib.md5()
    h.update(df.to_csv(index=False).encode())
    return h.hexdigest()


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None):
    import ray

    ray.init(
        address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
    )
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs = e.queries()
    sqls = e.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            failures.append(name)
            print(f"[FAIL] {name}: ray error: {type(ex).__name__} {ex}")
            continue
        if name not in sqls:
            print(f"[rows-only] {name}: {len(got)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            want = con.execute(sqls[name]).df()
        except Exception as ex:
            failures.append(name)
            print(f"[FAIL] {name}: sql error: {ex}")
            continue
        ok_rows = len(got) == len(want)
        ok_cols = sorted(got.columns) == sorted(want.columns)
        ok_hash = ok_rows and ok_cols and value_hash(got) == value_hash(want)
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"[{status}] {name}: rows {len(got)}/{len(want)} cols_ok={ok_cols} "
            f"hash_ok={ok_hash} ({time.time()-t0:.1f}s)"
        )
        if status == "FAIL" and ok_cols and ok_rows:
            a = got[sorted(got.columns)].sort_values(sorted(got.columns)).head(3)
            b = want[sorted(want.columns)].sort_values(sorted(want.columns)).head(3)
            print("  got:\n", a.to_string(), "\n  want:\n", b.to_string())
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
         sys.argv[2:] or None)
