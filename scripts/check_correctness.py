"""Local replica of the driver's correctness gate: run every queries()
entry, compare SQL-checked ones against DuckDB (row count + schema +
order-insensitive value compare), report rows-only counts for the rest.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            failures.append(name)
            print(f"[FAIL] {name}: query raised {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"[rows-only] {name}: {len(got)} rows, cols={list(got.columns)} ({dt:.1f}s)")
            continue
        want = canon(con.sql(sqls[name]).df())
        ok_rows = len(got) == len(want)
        ok_cols = list(got.columns) == list(want.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                # dtype-strict: the driver's value hash is dtype-sensitive
                # (an int64 engine column vs a DuckDB HUGEINT→float64
                # fetchdf column hash-mismatches even when numerically
                # equal), so the local gate must be too
                pd.testing.assert_frame_equal(
                    got.reset_index(drop=True), want.reset_index(drop=True),
                    check_dtype=True, check_exact=True,
                )
                ok_vals = True
            except AssertionError as e:
                msg = str(e).splitlines()[0]
                print(f"  value diff: {msg}")
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures.append(name)
            print(f"[{status}] {name}: rows {len(got)}/{len(want)} cols_ok={ok_cols} ({dt:.1f}s)")
            if not ok_cols:
                print(f"   got cols {list(got.columns)} want {list(want.columns)}")
        else:
            print(f"[OK]   {name}: {len(got)} rows ({dt:.1f}s)")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall green")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
