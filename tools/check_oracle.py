#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare row count / schema / values against the
Spark parquet output (columns sorted by name, rows sorted for comparison)."""
import sys, json, glob
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
results = {}
for name, sql in sorted(oracle.items()):
    try:
        want = con.sql(sql).df()
    except Exception as e:
        results[name] = f"ORACLE SQL ERROR: {e}"
        continue
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        results[name] = "NO SPARK OUTPUT"
        continue
    got = pd.concat([pd.read_parquet(f) for f in files])
    # normalize: sort columns by name, sort rows, reset index
    def norm(df):
        df = df[sorted(df.columns)].copy()
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        return df
    w, g = norm(want), norm(got)
    if list(w.columns) != list(g.columns):
        results[name] = f"COLS differ: oracle={list(w.columns)} spark={list(g.columns)}"
        continue
    if len(w) != len(g):
        results[name] = f"ROWS differ: oracle={len(w)} spark={len(g)}"
        continue
    try:
        pd.testing.assert_frame_equal(w, g, check_dtype=False, check_exact=True)
        results[name] = "OK"
    except AssertionError as e:
        msg = str(e).split("\n")[0:3]
        results[name] = "VALUES differ: " + " | ".join(msg)
for name, r in sorted(results.items()):
    print(f"{'PASS' if r=='OK' else 'FAIL':4} {name}: {r}")
n_ok = sum(1 for r in results.values() if r == "OK")
print(f"\n{n_ok}/{len(results)} oracle queries match")
