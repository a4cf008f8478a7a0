#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the sf tables and diff against the Verify parquet dumps.
Usage: python3 tools/check.py <verify_out_dir> [sf_dir]
"""
import sys, os, json, glob
import duckdb
import pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else "target/verify_out"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf}/{t}.parquet')")

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
fails = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(os.path.join(out, name, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    got = con.execute(
        f"SELECT * FROM parquet_scan({files!r})").df()
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    # driver-style: sort columns by name, then rows, compare values
    def norm(df):
        df = df[sorted(df.columns)]
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    g, e = norm(got), norm(exp)
    if list(g.columns) != list(e.columns):
        print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}"); fails += 1; continue
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); fails += 1; continue
    bad = []
    for c in g.columns:
        a, b = g[c], e[c]
        if str(a.dtype) != str(b.dtype):
            bad.append(f"dtype[{c}]: {a.dtype} vs {b.dtype}")
        try:
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                i = (~eq).idxmax()
                bad.append(f"val[{c}] row{i}: {a[i]!r} vs {b[i]!r} ({int((~eq).sum())} diffs)")
        except Exception as ex:
            bad.append(f"cmp[{c}]: {ex}")
    if bad:
        print(f"FAIL {name}: " + "; ".join(bad[:4])); fails += 1
    else:
        print(f"OK   {name} ({len(g)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
