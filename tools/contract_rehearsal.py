"""Run every queries() entry at sf0.01 and compare SQL-oracled ones
against DuckDB the way the driver does (sorted-columns value compare)."""
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import duckdb, pandas as pd, pyarrow as pa
import ray
ray.init(address="local", num_cpus=16, include_dashboard=False, log_to_driver=False)
import __ray_entry__ as E

SF = "/root/testdata/sf0.01"
TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

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
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

qs, oracles = E.queries(), E.oracle_sql()
fails = []
for name, fn in qs.items():
    t0 = time.time()
    try:
        mine = canon(to_pd(fn(SF)))
        status = f"rows={len(mine)}"
        # crawl_* oracles read the engine-written parquet, which exists
        # once the query itself has run (dict order guarantees it)
        if name in oracles:
            orc = canon(con.sql(oracles[name]).df())
            if list(mine.columns) != list(orc.columns):
                status = f"COLS MISMATCH {list(mine.columns)} vs {list(orc.columns)}"; fails.append(name)
            elif len(mine) != len(orc):
                status = f"ROWS MISMATCH {len(mine)} vs {len(orc)}"; fails.append(name)
            else:
                try:
                    pd.testing.assert_frame_equal(mine, orc, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
                    status = f"ORACLE OK rows={len(mine)}"
                except AssertionError as e:
                    status = "VALUE MISMATCH: " + str(e).splitlines()[0][:80]; fails.append(name)
    except Exception as e:
        status = f"ERROR {type(e).__name__}: {str(e)[:100]}"; fails.append(name)
    print(f"{name:32s} {time.time()-t0:6.1f}s  {status}", flush=True)
print("FAILS:", fails)
ray.shutdown()
