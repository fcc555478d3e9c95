#!/usr/bin/env python3
"""Dev-side replica of the driver's DuckDB-oracle compare (BASELINE.md t2).

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: run the oracle SQL in DuckDB over the
same parquet tables, sort columns by name, sort rows, compare values.

STRICT by design (round-4 fix): the driver hashes RENDERED values, so a
Spark bigint `64` vs a DuckDB HUGEINT/double `64.0` is a driver hash_match
failure even though a float-coercing compare would pass. Therefore:
  - a float-kind vs integer/bool/string-kind dtype mismatch FAILS loudly
    (DuckDB sum(INTEGER/BIGINT) returns HUGEINT -> pandas float64; the
    oracle SQL must CAST(sum(...) AS BIGINT));
  - non-float columns compare EXACTLY (string equality, null==null);
  - only when BOTH sides are genuinely float do we use a 1e-6 tolerance,
    and we additionally WARN when the float values are not bit-identical
    (the driver's hash may still disagree on rendering).
"""
import json, sys, glob, os
import duckdb
import numpy as np
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")


def kind(series):
    """Collapse a dtype to the comparison kind the driver's render cares
    about: 'f' float, 'i' integer, 'b' bool, 's' string/other object."""
    dt = series.dtype
    if pd.api.types.is_float_dtype(dt):
        return "f"
    if pd.api.types.is_bool_dtype(dt):
        return "b"
    if pd.api.types.is_integer_dtype(dt):
        return "i"
    # object columns holding Python ints (DuckDB HUGEINT sometimes lands
    # here) count as integer if every non-null value is an int
    if dt == object:
        non_null = series.dropna()
        if len(non_null) and all(isinstance(v, (int, np.integer))
                                 and not isinstance(v, (bool, np.bool_))
                                 for v in non_null):
            return "i"
        if len(non_null) and all(isinstance(v, (bool, np.bool_))
                                 for v in non_null):
            return "b"
    return "s"


failures = 0
warnings = 0

# A query that CRASHED in graft.Verify leaves no result dir at all — it
# must count as a failure here, not silently vanish from the report
# (found the hard way: a [verify] error on stderr plus "0 failures" from
# this tool reads as green). When GRAFT_VERIFY_ONLY subset-filtered the
# dump, scope the check to that subset.
_oracle_keys = set(json.load(open(f"{out_dir}/oracle_sql.json")))
_only = os.environ.get("GRAFT_VERIFY_ONLY")
if _only:
    _oracle_keys &= set(_only.split(","))
for name in sorted(_oracle_keys):
    if not os.path.isdir(os.path.join(out_dir, name)):
        print(f"{name:28s} MISSING RESULT (query failed in Verify?)")
        failures += 1

for name in sorted(os.listdir(out_dir)):
    qdir = os.path.join(out_dir, name)
    if not os.path.isdir(qdir):
        continue
    spark_df = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(f"{qdir}/*.parquet")],
        ignore_index=True)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if name not in oracle:
        print(f"{name:28s} rows-only: {len(spark_df)} rows "
              + ("OK" if len(spark_df) > 0 else "EMPTY (suspicious)"))
        continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name:28s} ORACLE SQL ERROR: {e}")
        failures += 1
        continue
    a = spark_df.reindex(sorted(spark_df.columns), axis=1)
    b = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(a.columns) != list(b.columns):
        print(f"{name:28s} COLUMN MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
        failures += 1
        continue
    if len(a) != len(b):
        print(f"{name:28s} ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}")
        failures += 1
        continue
    a = a.sort_values(by=list(a.columns), ignore_index=True)
    b = b.sort_values(by=list(b.columns), ignore_index=True)
    bad = None
    for c in a.columns:
        av, bv = a[c], b[c]
        ka, kb = kind(av), kind(bv)
        if ka != kb:
            bad = (f"DTYPE MISMATCH col {c}: spark dtype={av.dtype}({ka}) "
                   f"duck dtype={bv.dtype}({kb}) — driver hash WILL differ "
                   f"(e.g. 64 vs 64.0); CAST the oracle side")
            break
        if ka == "f":
            fa = pd.to_numeric(av, errors="coerce").astype(float)
            fb = pd.to_numeric(bv, errors="coerce").astype(float)
            both_nan = fa.isna() & fb.isna()
            close = ((fa - fb).abs() <= 1e-6 + 1e-6 * fb.abs()) | both_nan
            if not close.all():
                i = close.idxmin()
                bad = f"col {c} row {i}: spark={fa[i]} duck={fb[i]}"
                break
            exact = (fa == fb) | both_nan
            if not exact.all():
                i = exact.idxmin()
                print(f"{name:28s} WARN col {c} float not bit-exact "
                      f"(row {i}: {fa[i]!r} vs {fb[i]!r}) — within 1e-6 but "
                      f"the driver's hash may disagree; round on both sides")
                warnings += 1
        else:
            sa = av.astype(str).where(~av.isna(), "<null>")
            sb = bv.astype(str).where(~bv.isna(), "<null>")
            eq = (sa == sb)
            if not eq.all():
                i = eq.idxmin()
                bad = f"col {c} row {i}: spark={av[i]!r} duck={bv[i]!r}"
                break
    if bad:
        print(f"{name:28s} VALUE MISMATCH {bad}")
        failures += 1
    else:
        print(f"{name:28s} OK ({len(a)} rows)")
print(f"\n{failures} failures, {warnings} warnings")
sys.exit(1 if failures else 0)
