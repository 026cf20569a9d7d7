#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare with the Spark result parquet (columns
sorted by name, rows sorted, values hashed with rounding for floats)."""
import sys, json, glob, os, math
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # round floats to tolerate fp noise; normalize nulls to one sentinel
    for c in df.columns:
        if df[c].dtype.kind == 'f':
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v, (list, tuple)) or hasattr(v, '__len__') and not isinstance(v, (str, bytes)) else v)
    def keyf(s):
        st = s.astype(str)
        st[s.isna()] = "\x00NULL"
        return st
    df = df.sort_values(by=list(df.columns), ignore_index=True, key=keyf)
    return df

results = {}
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{d}/*.parquet")], ignore_index=True) if glob.glob(f"{d}/*.parquet") else pd.DataFrame()
    except Exception as e:
        results[name] = f"SPARK_READ_FAIL {e}"
        continue
    if name not in oracle:
        results[name] = f"ROWS_ONLY rows={len(spark_df)}"
        continue
    try:
        ora_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE_FAIL {str(e)[:200]}"
        continue
    sc, oc = sorted(spark_df.columns), sorted(ora_df.columns)
    if sc != oc:
        results[name] = f"SCHEMA_MISMATCH spark={sc} oracle={oc}"
        continue
    if len(spark_df) != len(ora_df):
        results[name] = f"ROWCOUNT spark={len(spark_df)} oracle={len(ora_df)}"
        continue
    a, b = canon(spark_df), canon(ora_df)
    try:
        eq = True
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                av = pd.to_numeric(av, errors='coerce')
                bv = pd.to_numeric(bv, errors='coerce')
                ok = ((av - bv).abs() < 1e-6) | (av.isna() & bv.isna())
            else:
                ok = (av.astype(str) == bv.astype(str)) | (av.isna() & bv.isna())
            if not ok.all():
                eq = False
                bad = (~ok).idxmax()
                results[name] = f"VALUE_MISMATCH col={c} row{bad}: spark={a[c][bad]!r} oracle={b[c][bad]!r}"
                break
        if eq:
            results[name] = "OK"
    except Exception as e:
        results[name] = f"COMPARE_FAIL {str(e)[:200]}"

n_ok = sum(1 for v in results.values() if v == "OK")
n_rows_only = sum(1 for v in results.values() if v.startswith("ROWS_ONLY"))
for k, v in results.items():
    print(f"{'PASS' if v=='OK' else 'INFO' if v.startswith('ROWS_ONLY') else 'FAIL':5s} {k}: {v}")
print(f"\n{n_ok} OK, {n_rows_only} rows-only, {len(results)-n_ok-n_rows_only} FAIL of {len(results)}")
