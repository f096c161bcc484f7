#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare: for each query dumped
by graft.Verify, run the oracle SQL in DuckDB over the same parquet tables
and compare sorted-column values exactly."""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        results[name] = "NO_SPARK_OUTPUT"
        continue
    spark_df = pq.read_table(files[0]).to_pandas()
    if name not in oracle:
        results[name] = f"ROWS_ONLY rows={len(spark_df)}"
        continue
    try:
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        results[name] = f"ORACLE_SQL_ERROR: {e}"
        continue
    s = spark_df[sorted(spark_df.columns)]
    dd = duck_df[sorted(duck_df.columns)]
    if list(s.columns) != list(dd.columns):
        results[name] = f"SCHEMA_MISMATCH spark={list(s.columns)} duck={list(dd.columns)}"
        continue
    if len(s) != len(dd):
        results[name] = f"ROWCOUNT_MISMATCH spark={len(s)} duck={len(dd)}"
        continue
    mismatches = []
    for c in s.columns:
        a, b = s[c].values, dd[c].values
        try:
            if pd.api.types.is_float_dtype(s[c]) or pd.api.types.is_float_dtype(dd[c]):
                af = s[c].astype(float).values; bf = dd[c].astype(float).values
                eq = (np.isnan(af) & np.isnan(bf)) | (af == bf)
            else:
                eq = pd.Series(a).astype(str).values == pd.Series(b).astype(str).values
            if not eq.all():
                i = int(np.argmin(eq))
                mismatches.append(f"{c}[row {i}]: spark={a[i]!r} duck={b[i]!r}")
        except Exception as e:
            mismatches.append(f"{c}: compare error {e}")
    results[name] = "OK" if not mismatches else "VALUE_MISMATCH " + "; ".join(mismatches[:3])

width = max(len(k) for k in results)
n_ok = sum(1 for v in results.values() if v == "OK")
n_rows_only = sum(1 for v in results.values() if v.startswith("ROWS_ONLY"))
for k, v in sorted(results.items()):
    print(f"{k:<{width}}  {v[:300]}")
print(f"\n{n_ok} OK, {n_rows_only} rows-only, {len(results)-n_ok-n_rows_only} failing, of {len(results)}")
