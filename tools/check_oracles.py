"""Driver-mimic: run every queries() entry and compare against its
oracle_sql() under DuckDB — row count, schema (column names), and an
order-insensitive value hash with columns sorted by name (exactly the
driver's comparison shape).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = df.astype(str).apply(lambda r: "\x1f".join(r), axis=1)
    h = hashlib.sha256()
    for row in sorted(rows):
        h.update(row.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e
    qs = e.queries()
    oracles = e.oracle_sql()
    # fixture-path oracles are baked for the driver's sf0.01 contract;
    # re-point them at the swept sf so the SQL reads the same fixture
    from sbb_ned_ray.pipelines.queries import oracle_sql_for
    oracles.update({k: v for k, v in oracle_sql_for(sf_dir).items()
                    if k in oracles})

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(mine)} (rows-only) {dt:.1f}s")
            continue
        try:
            oracle = con.sql(oracles[name]).df()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: oracle raised {ex}")
            continue
        problems = []
        if len(mine) != len(oracle):
            problems.append(f"rows {len(mine)} vs {len(oracle)}")
        if sorted(mine.columns) != sorted(oracle.columns):
            problems.append(f"cols {sorted(mine.columns)} vs "
                            f"{sorted(oracle.columns)}")
        elif value_hash(mine) != value_hash(oracle):
            problems.append("value-hash mismatch")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
            mc = sorted(set(mine.columns) & set(oracle.columns))
            a = mine[mc].sort_values(mc).reset_index(drop=True)
            b = oracle[mc].sort_values(mc).reset_index(drop=True)
            if len(a) == len(b):
                neq = (a.astype(str) != b.astype(str)).any(axis=1)
                print("  first diffs:\n", a[neq].head(3), "\n  vs\n",
                      b[neq].head(3))
        else:
            print(f"ok   {name}: rows={len(mine)} MATCH {dt:.1f}s")

    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries ok")


if __name__ == "__main__":
    main()
