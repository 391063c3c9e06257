#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: compare_oracle.py <sfDir> <verifyOutDir>

For each query dump <out>/<name>/ (parquet) with an entry in
<out>/oracle_sql.json: run the SQL in DuckDB against views named after the
parquet tables in <sfDir>, sort columns by name, sort rows, and compare
values (exact for non-floats, tiny-epsilon report for floats). Queries
without oracle SQL get a rows-only report.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

def load_spark(path):
    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def canon(df):
    df = df[sorted(df.columns)]
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    for name in names:
        spark_df = load_spark(os.path.join(out_dir, name))
        if spark_df is None:
            print(f"FAIL  {name}: no spark output"); n_fail += 1; continue
        if name not in oracles:
            print(f"ROWS  {name}: rows={len(spark_df)} (no oracle)"); continue
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); n_fail += 1; continue
        a, b = canon(spark_df), canon(oracle_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}"); n_fail += 1; continue
        mismatch = None
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
                av = av.astype(float); bv = bv.astype(float)
                bad = ~(np.isclose(av, bv, rtol=0, atol=0, equal_nan=True))
                exact = int(bad.sum())
                if exact:
                    close = ~(np.isclose(av, bv, rtol=1e-9, atol=1e-12, equal_nan=True))
                    mismatch = (c, exact, int(close.sum()),
                                [(x, y) for x, y in zip(av[bad][:3], bv[bad][:3])])
                    break
            else:
                if a[c].dtype != b[c].dtype:
                    try:
                        bvs = b[c].astype(a[c].dtype)
                    except Exception:
                        mismatch = (c, "dtype", str(a[c].dtype) + " vs " + str(b[c].dtype), [])
                        break
                    # dtype coercion needed — report but compare values
                    if not a[c].equals(bvs):
                        mismatch = (c, "values+dtype", str(a[c].dtype) + " vs " + str(b[c].dtype), [])
                        break
                    print(f"WARN  {name}.{c}: dtype {a[c].dtype} vs {b[c].dtype} (values equal)")
                elif not a[c].equals(b[c]):
                    neq = (a[c] != b[c]) & ~(a[c].isna() & b[c].isna())
                    ex = list(zip(a[c][neq][:3], b[c][neq][:3]))
                    mismatch = (c, int(neq.sum()), None, ex)
                    break
        if mismatch:
            print(f"FAIL  {name}: col {mismatch[0]}: {mismatch[1]} diffs "
                  f"(tol-remaining {mismatch[2]}): {mismatch[3]}")
            n_fail += 1
        else:
            print(f"PASS  {name}: rows={len(a)}"); n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {len(names)-n_pass-n_fail} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
