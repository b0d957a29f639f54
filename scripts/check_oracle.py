"""Local simulation of the driver's correctness gate: run every
queries() entry and compare row count, schema and order-insensitive
values against its oracle_sql() twin via DuckDB.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, mine: pd.DataFrame, oracle: pd.DataFrame) -> list[str]:
    issues = []
    if len(mine) != len(oracle):
        issues.append(f"rows {len(mine)} != {len(oracle)}")
    a, b = canon(mine), canon(oracle)
    if list(a.columns) != list(b.columns):
        issues.append(f"cols {list(a.columns)} != {list(b.columns)}")
        return issues
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if np.issubdtype(a[c].dtype, np.floating):
                ok = np.allclose(av.astype(float), bv.astype(float), atol=0, rtol=0, equal_nan=True)
            else:
                ok = (av == bv).all()
            if not ok:
                bad = np.flatnonzero(~(av == bv) if not np.issubdtype(a[c].dtype, np.floating) else ~np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=0))
                issues.append(f"col {c}: {len(bad)} mismatches, first at {bad[:3]}: mine={av[bad[:3]]}, oracle={bv[bad[:3]]}")
    return issues


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = e.queries()
    sqls = e.oracle_sql()
    n_bad = 0
    n_pass = 0
    n_rows_only = 0
    names = [n for n in qs if not only or n in only]
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.perf_counter()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            n_bad += 1
            continue
        dt = time.perf_counter() - t0
        if name not in sqls:
            print(f"ok?  {name}: rows={len(mine)} ({dt:.1f}s) [no oracle — rows-only]")
            n_rows_only += 1
            continue
        try:
            oracle = con.sql(sqls[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL raised {ex}")
            n_bad += 1
            continue
        issues = compare(name, mine, oracle)
        if issues:
            print(f"FAIL {name}: {'; '.join(issues)} ({dt:.1f}s)")
            n_bad += 1
        else:
            print(f"PASS {name}: rows={len(mine)} ({dt:.1f}s)")
            n_pass += 1
    print(
        f"SUMMARY: {n_pass} PASS, {n_rows_only} rows-only, {n_bad} FAIL "
        f"of {len(names)} queries"
    )
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
