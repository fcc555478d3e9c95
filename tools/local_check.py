#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables, load the Spark result parquet written
by graft.Verify, sort columns by name / rows by all columns, and compare
values + dtypes. Usage: local_check.py <sfDir> <verifyOutDir> [q...]"""
import sys, json, glob
import duckdb, pandas as pd, numpy as np

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(f"{out}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"{name}: NO SPARK OUTPUT"); fail += 1; continue
    try:
        odf = con.execute(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE ERR {str(e)[:200]}"); fail += 1; continue
    sdf = pd.read_parquet(f"{out}/{name}")
    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    odf = odf.reindex(sorted(odf.columns), axis=1)
    try:
        sdf = sdf.sort_values(by=list(sdf.columns)).reset_index(drop=True)
        odf = odf.sort_values(by=list(odf.columns)).reset_index(drop=True)
    except Exception as e:
        print(f"{name}: SORT ERR {str(e)[:150]}"); fail += 1; continue
    if list(sdf.columns) != list(odf.columns):
        print(f"{name}: COLS spark={list(sdf.columns)} oracle={list(odf.columns)}"); fail += 1; continue
    if len(sdf) != len(odf):
        print(f"{name}: ROWS spark={len(sdf)} oracle={len(odf)}"); fail += 1; continue
    dt_mismatch = [(c, str(sdf[c].dtype), str(odf[c].dtype))
                   for c in sdf.columns if sdf[c].dtype != odf[c].dtype]
    # float-vs-integer kind drift (DuckDB HUGEINT -> float64) renders 64.0
    # where Spark renders 64: the driver's hash compare fails even though
    # numpy's == passes, so treat it as a hard failure here too.
    def _kind(s):
        if pd.api.types.is_float_dtype(s.dtype): return "f"
        if pd.api.types.is_bool_dtype(s.dtype): return "b"
        if pd.api.types.is_integer_dtype(s.dtype): return "i"
        return "s"
    kind_mismatch = [(c, str(sdf[c].dtype), str(odf[c].dtype))
                     for c in sdf.columns if _kind(sdf[c]) != _kind(odf[c])]
    if kind_mismatch:
        print(f"{name}: DTYPE KIND MISMATCH {kind_mismatch} "
              f"(driver renders e.g. 64 vs 64.0 -> hash fail; CAST the oracle)")
        fail += 1
        continue
    ok = True
    for c in sdf.columns:
        a, b = sdf[c].values, odf[c].values
        eq = (a == b) | (pd.isna(a) & pd.isna(b))
        if not eq.all():
            i = int(np.argmin(eq))
            print(f"{name}: VALUE MISMATCH col={c} row={i} spark={a[i]!r} oracle={b[i]!r} "
                  f"(n_bad={int((~eq).sum())})")
            ok = False; fail += 1
            break
    if ok:
        note = f" [dtype diff: {dt_mismatch}]" if dt_mismatch else ""
        print(f"{name}: OK rows={len(sdf)}{note}")
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
