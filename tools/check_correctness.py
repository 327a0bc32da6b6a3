"""Driver-simulation: run queries() vs oracle_sql() side by side.

Mimics the graft driver's correctness gate: per query, compare row
count, column names, and an order-insensitive value hash (rows sorted
by all columns, columns sorted by name). Floats are compared via
exact repr — the same bar the driver's value-hash implies.

Usage: python tools/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def to_pandas(obj):
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for col in df.columns:
        for v in df[col].tolist():
            h.update(repr(v).encode())
            h.update(b"\x1f")
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main(sf_dir: str) -> int:
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, ignore_reinit_error=True)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ray_entry", os.path.join(REPO, "__ray_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, sqls = mod.queries(), mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            got = canonical(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        if name not in sqls:
            print(f"rows-only  {name}: {len(got)} rows, cols={list(got.columns)} ({dt:.2f}s)")
            continue
        want = canonical(con.sql(sqls[name]).df())
        status = []
        if len(got) != len(want):
            status.append(f"rowcount {len(got)} != {len(want)}")
        if list(got.columns) != list(want.columns):
            status.append(f"schema {list(got.columns)} != {list(want.columns)}")
        if not status:
            # normalize dtypes for hashing (int64 vs int32 etc.)
            g = got.astype({c: "float64" for c in got.columns if str(got[c].dtype).startswith(("int", "uint", "float"))})
            w = want.astype({c: "float64" for c in want.columns if str(want[c].dtype).startswith(("int", "uint", "float"))})
            hg, hw = value_hash(g), value_hash(w)
            if hg != hw:
                status.append(f"valuehash {hg} != {hw}")
                # show first differing row for debugging
                neq = (g != w) & ~(g.isna() & w.isna())
                bad = neq.any(axis=1)
                if bad.any():
                    i = bad.idxmax()
                    print(f"    first diff row {i}:\n      got  {g.loc[i].to_dict()}\n      want {w.loc[i].to_dict()}")
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows match ({dt:.2f}s)")
    ray.shutdown()
    print(f"\n{failures} failures / {len(qs)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))
