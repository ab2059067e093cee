#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <outDir produced by graft.Verify> <sfDir>

For each <name>/ parquet dir in outDir, runs oracle_sql.json[name] in DuckDB
(views registered per table) and compares: column names (sorted), row count,
and values (rows sorted by all columns, column order sorted by name).
Floats compared exactly first, then with rel tol 1e-9 as a diagnostic.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a stable total sort across dtypes
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = canon(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        if list(got.columns) == ["_graft_error"]:
            # Verify's error marker: the query raised — surface the
            # actual message instead of a generic column mismatch
            msg = got["_graft_error"].iloc[0] if len(got) else "?"
            print(f"FAIL {name}: query errored: {msg[:200]}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(got)})"); n_noracle += 1
            continue
        try:
            exp = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols got={list(got.columns)} exp={list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows got={len(got)} exp={len(exp)}")
            n_fail += 1; continue
        ok = True
        for c in got.columns:
            g, e = got[c].values, exp[c].values
            if got[c].dtype.kind == 'f' or exp[c].dtype.kind == 'f':
                if not np.array_equal(g.astype(float), e.astype(float), equal_nan=True):
                    close = np.allclose(g.astype(float), e.astype(float),
                                        rtol=1e-9, equal_nan=True)
                    print(f"FAIL {name}: col {c} float mismatch (close={close})")
                    ok = False; break
            else:
                ga = pd.Series(g).astype(str).values
                ea = pd.Series(e).astype(str).values
                if not np.array_equal(ga, ea):
                    bad = np.nonzero(ga != ea)[0][:3]
                    print(f"FAIL {name}: col {c} mismatch at rows {bad.tolist()}"
                          f" got={ga[bad].tolist()} exp={ea[bad].tolist()}")
                    ok = False; break
        if ok:
            # dtype diagnostic (schema strictness unknown in driver)
            dt = [(c, str(got[c].dtype), str(exp[c].dtype))
                  for c in got.columns if got[c].dtype != exp[c].dtype]
            note = f" DTYPE-DIFF {dt}" if dt else ""
            print(f"PASS {name} ({len(got)} rows){note}"); n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
