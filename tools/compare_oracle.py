#!/usr/bin/env python3
"""Dev-side replica of the driver's DuckDB-oracle compare (BASELINE.md t2).

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: run the oracle SQL in DuckDB over the
same parquet tables, sort columns by name, sort rows, compare values with a
small numeric tolerance. Purely a local development check — the driver runs
its own equivalent.
"""
import json, sys, glob, os, math
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
failures = 0
for name in sorted(os.listdir(out_dir)):
    qdir = os.path.join(out_dir, name)
    if not os.path.isdir(qdir):
        continue
    spark_df = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(f"{qdir}/*.parquet")],
        ignore_index=True)
    if name not in oracle:
        print(f"{name:24s} rows-only: {len(spark_df)} rows "
              + ("OK" if len(spark_df) > 0 else "EMPTY (suspicious)"))
        continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name:24s} ORACLE SQL ERROR: {e}")
        failures += 1
        continue
    a = spark_df.reindex(sorted(spark_df.columns), axis=1)
    b = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(a.columns) != list(b.columns):
        print(f"{name:24s} COLUMN MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
        failures += 1
        continue
    if len(a) != len(b):
        print(f"{name:24s} ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}")
        failures += 1
        continue
    a = a.sort_values(by=list(a.columns), ignore_index=True)
    b = b.sort_values(by=list(b.columns), ignore_index=True)
    bad = None
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = pd.to_numeric(av, errors="coerce").astype(float)
            bv = pd.to_numeric(bv, errors="coerce").astype(float)
            both_nan = av.isna() & bv.isna()
            close = ((av - bv).abs() <= 1e-6 + 1e-6 * bv.abs()) | both_nan
            if not close.all():
                i = close.idxmin()
                bad = f"col {c} row {i}: spark={av[i]} duck={bv[i]}"
                break
        else:
            eq = (av.astype(str) == bv.astype(str))
            if not eq.all():
                i = eq.idxmin()
                bad = f"col {c} row {i}: spark={av[i]!r} duck={bv[i]!r}"
                break
    if bad:
        print(f"{name:24s} VALUE MISMATCH {bad}")
        failures += 1
    else:
        print(f"{name:24s} OK ({len(a)} rows)")
print(f"\n{failures} failures")
sys.exit(1 if failures else 0)
