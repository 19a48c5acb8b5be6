"""Simulate the driver's correctness check: run each queries() entry and
its oracle_sql() on sf0.01, compare rows + order-insensitive values."""
import sys, time, hashlib
import duckdb
import pandas as pd
import numpy as np
import ray

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import logging
logging.getLogger("ray.data").setLevel(logging.ERROR)

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def to_df(res):
    import ray.data
    import pyarrow as pa
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res

def norm_hash(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    # sort rows by all columns for order-insensitivity
    df = df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)
    return hashlib.sha256(pd.util.hash_pandas_object(df.round(6) if df.select_dtypes('number').shape[1] else df, index=False).values.tobytes()).hexdigest()[:12], df

qs = entrymod.queries()
oracles = entrymod.oracle_sql()
only = sys.argv[1:] if len(sys.argv) > 1 else None
for name, fn in qs.items():
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        rdf = to_df(fn(SF))
    except Exception as e:
        print(f"{name:28s} RAY-ERROR {type(e).__name__}: {e}")
        continue
    dt = time.time() - t0
    if name not in oracles:
        print(f"{name:28s} rows-only rows={len(rdf)} cols={sorted(rdf.columns)} {dt:.1f}s")
        continue
    try:
        odf = con.sql(oracles[name]).df()
    except Exception as e:
        print(f"{name:28s} SQL-ERROR {e}")
        continue
    ok_rows = len(rdf) == len(odf)
    ok_schema = sorted(rdf.columns) == sorted(odf.columns)
    h1, d1 = norm_hash(rdf)
    h2, d2 = norm_hash(odf)
    status = "OK" if (ok_rows and ok_schema and h1 == h2) else "MISMATCH"
    print(f"{name:28s} {status} rows={len(rdf)}/{len(odf)} schema={ok_schema} hash={h1}/{h2} {dt:.1f}s")
    if status == "MISMATCH" and ok_schema and ok_rows:
        diff = (d1.compare(d2) if d1.shape == d2.shape else None)
        if diff is not None and len(diff):
            print(diff.head(5))
ray.shutdown()
