#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: compare.py <sfDir> <verifyOutDir>
For each <name> dir of parquet under verifyOutDir, run oracle_sql.json[name]
in DuckDB with the sfDir parquet tables registered as views, sort columns by
name, sort rows, and compare value-by-value.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types a bit: timestamps -> iso strings, floats -> repr
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = 0
    # a query that errored in Verify leaves no output dir — that is a
    # failure, not a silent skip
    for name in sorted(set(oracle) - set(names)):
        print(f"[FAIL] {name}: no Verify output (query errored?)"); n_fail += 1
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            print(f"[rows-only] {name}: rows={len(got)}")
            continue
        want = con.execute(oracle[name]).df()
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"[FAIL] {name}: columns differ got={list(g.columns)} want={list(w.columns)}"); n_fail += 1; continue
        if len(g) != len(w):
            print(f"[FAIL] {name}: rows got={len(g)} want={len(w)}"); n_fail += 1; continue
        eq = True
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
                    import numpy as np
                    if not np.allclose(a.astype(float), b.astype(float), rtol=0, atol=1e-9, equal_nan=True):
                        eq = False; print(f"  col {c} differs (float)"); break
                else:
                    if not (a.astype(str).values == b.astype(str).values).all():
                        eq = False; print(f"  col {c} differs"); break
            except Exception as e:
                eq = False; print(f"  col {c} compare error: {e}"); break
        if eq: print(f"[ok]   {name}: {len(g)} rows"); n_pass += 1
        else:
            print(f"[FAIL] {name}")
            print("  got:", g.head(3).to_dict("records"))
            print("  want:", w.head(3).to_dict("records"))
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(names)-n_pass-n_fail} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
