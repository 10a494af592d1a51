"""Driver-mimic: run every queries() entry on Spark AND its oracle_sql on
DuckDB at a given sf dir; compare row count, sorted column names, and an
order-insensitive value hash. Usage: python .data/check_parity.py [sf_dir]"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from skipmap_processor_spark.session import get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
only = sys.argv[2].split(",") if len(sys.argv) > 2 else None

spark = get_spark(master="local[8]", shuffle_partitions=8, driver_memory="6g")
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
    )


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].astype("float64")
        elif "int" in str(df[c].dtype) or "Int" in str(df[c].dtype):
            df[c] = df[c].astype("int64")
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype(str)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


qs = entrymod.queries()
oracles = entrymod.oracle_sql()
fails = []
for name, fn in qs.items():
    if only and name not in only:
        continue
    t0 = time.monotonic()
    try:
        sdf = fn(spark, sf_dir).toPandas()
    except Exception as e:
        print(f"{name:28s} SPARK-ERROR {e}")
        fails.append(name)
        continue
    spark_sec = time.monotonic() - t0
    if name not in oracles:
        print(f"{name:28s} rows-only  n={len(sdf)}  spark={spark_sec:.1f}s")
        if len(sdf) == 0:
            print(f"   WARN: {name} returned 0 rows")
        continue
    try:
        odf = con.execute(oracles[name]).df()
    except Exception as e:
        print(f"{name:28s} DUCK-ERROR {e}")
        fails.append(name)
        continue
    a, b = canon(sdf), canon(odf)
    ok_cols = list(a.columns) == list(b.columns)
    ok_rows = len(a) == len(b)
    ok_vals = ok_cols and ok_rows and a.equals(b)
    status = "OK" if ok_vals else "MISMATCH"
    print(f"{name:28s} {status}  n={len(a)}/{len(b)}  spark={spark_sec:.1f}s")
    if not ok_vals:
        fails.append(name)
        if not ok_cols:
            print("   cols:", list(a.columns), "vs", list(b.columns))
        elif ok_rows:
            neq = ~(a == b).all(axis=1)
            print("   first diffs:\n", a[neq].head(3), "\n", b[neq].head(3))
        else:
            print("   row counts differ")

print("\nFAILS:", fails if fails else "none")
spark.stop()
sys.exit(1 if fails else 0)
