"""Local oracle harness: run queries() vs oracle_sql() like the driver.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
Compares row count, column names, and an order-insensitive value hash
(rows sorted by all columns, columns sorted by name).
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, __file__.rsplit("/", 2)[0])

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs = e.queries()
    oracles = e.oracle_sql()
    only = sys.argv[2:]
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            ours = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        secs = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(ours)} (rows-only, {secs:.1f}s)")
            continue
        try:
            theirs = canon(con.sql(oracles[name]).df())
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {ex}")
            failed.append(name)
            continue
        if list(ours.columns) != list(theirs.columns):
            print(f"FAIL {name}: cols {list(ours.columns)} vs {list(theirs.columns)}")
            failed.append(name)
            continue
        if len(ours) != len(theirs):
            print(f"FAIL {name}: rows {len(ours)} vs {len(theirs)}")
            failed.append(name)
            continue
        h1 = pd.util.hash_pandas_object(ours, index=False).sum()
        h2 = pd.util.hash_pandas_object(theirs, index=False).sum()
        if h1 != h2:
            diff = ours.compare(theirs) if ours.shape == theirs.shape else None
            print(f"FAIL {name}: value hash mismatch; sample diff:\n{diff.head(5) if diff is not None else ''}")
            failed.append(name)
            continue
        print(f"OK   {name}: rows={len(ours)} ({secs:.1f}s)")
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
