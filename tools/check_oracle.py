#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run Verify outputs
vs DuckDB oracle on the same parquet tables. Strict compare: sort columns
by name, sort rows, compare values exactly (incl. dtype class)."""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fail += 1; continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}"); fail += 1; continue
    exp = exp.sort_values(by=list(exp.columns), ignore_index=True)
    got = got.sort_values(by=list(got.columns), ignore_index=True)
    if len(exp) != len(got):
        print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}"); fail += 1; continue
    mismatch = []
    for c in exp.columns:
        e, g = exp[c], got[c]
        # normalize timestamp precision for compare
        if pd.api.types.is_datetime64_any_dtype(e) or pd.api.types.is_datetime64_any_dtype(g):
            e = pd.to_datetime(e).astype("datetime64[us]")
            g = pd.to_datetime(g).astype("datetime64[us]")
        ecls = "num" if pd.api.types.is_numeric_dtype(e) else str(e.dtype)
        gcls = "num" if pd.api.types.is_numeric_dtype(g) else str(g.dtype)
        if ecls != gcls:
            mismatch.append(f"{c}: dtype {e.dtype} vs {g.dtype}"); continue
        if ecls == "num":
            if str(e.dtype) != str(g.dtype):
                mismatch.append(f"{c}: NUMDTYPE {e.dtype} vs {g.dtype} (may or may not matter)")
            ev, gv = e.astype("float64").values, g.astype("float64").values
            both_nan = np.isnan(ev) & np.isnan(gv)
            if not np.all((ev == gv) | both_nan):
                bad = np.where(~((ev == gv) | both_nan))[0][:3]
                mismatch.append(f"{c}: values differ at {bad}: exp={ev[bad]} got={gv[bad]}")
        else:
            if not e.fillna("<NA>").equals(g.fillna("<NA>")):
                neq = (e.fillna('<NA>') != g.fillna('<NA>'))
                idx = list(np.where(neq)[0][:3])
                mismatch.append(f"{c}: values differ at {idx}: exp={list(e[neq][:3])} got={list(g[neq][:3])}")
    if mismatch:
        print(f"FAIL {name}: " + "; ".join(mismatch)); fail += 1
    else:
        print(f"OK   {name} ({len(exp)} rows)"); ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
