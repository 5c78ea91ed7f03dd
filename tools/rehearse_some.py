"""Rehearse a subset of queries() entries by name (driver-style
sorted-columns value compare vs their DuckDB oracles at sf0.01).

Usage: python tools/rehearse_some.py [--sf DIR] name [name ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import duckdb
import pandas as pd
import pyarrow as pa
import ray

args = sys.argv[1:]
SF = "/root/testdata/sf0.01"
if args and args[0] == "--sf":
    SF = args[1]
    args = args[2:]

ray.init(address="local", num_cpus=16, include_dashboard=False,
         log_to_driver=False)
import __ray_entry__ as E

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )


def to_pd(r):
    import ray.data

    if isinstance(r, ray.data.Dataset):
        return r.to_pandas()
    if isinstance(r, pa.Table):
        return r.to_pandas()
    return r


def canon(df):
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64").round(9)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


qs, oracles = E.queries(), E.oracle_sql()
fails = []
for name in args:
    fn = qs[name]
    t0 = time.time()
    try:
        mine = canon(to_pd(fn(SF)))
        status = f"rows={len(mine)} (no oracle)"
        if name in oracles:
            orc = canon(con.sql(oracles[name]).df())
            if list(mine.columns) != list(orc.columns):
                status = (
                    f"COLS MISMATCH {list(mine.columns)} vs "
                    f"{list(orc.columns)}"
                )
                fails.append(name)
            elif len(mine) != len(orc):
                status = f"ROWS MISMATCH {len(mine)} vs {len(orc)}"
                fails.append(name)
            else:
                try:
                    pd.testing.assert_frame_equal(
                        mine, orc, check_dtype=False, check_exact=False,
                        rtol=0, atol=1e-9,
                    )
                    status = f"ORACLE OK rows={len(mine)}"
                except AssertionError as e:
                    status = "VALUE MISMATCH: " + str(e).splitlines()[0][:80]
                    fails.append(name)
    except Exception as e:
        status = f"ERROR {type(e).__name__}: {str(e)[:120]}"
        fails.append(name)
    print(f"{name:32s} {time.time() - t0:6.1f}s  {status}", flush=True)
print("FAILS:", fails)
ray.shutdown()
