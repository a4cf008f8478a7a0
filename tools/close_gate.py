#!/usr/bin/env python3
"""Round-close correctness gate.

The round's single hard signal is a per-query oracle compare; round 9
shipped an empty `{}` driver artifact and the claim had to be
recovered by a judge re-run. This gate makes an empty or partial
record impossible to close on:

  1. runs every oracle SQL from <outDir>/oracle_sql.json in DuckDB
     against the sf tables and compares rows/schema/values with the
     Spark dumps under <outDir>/<name>/,
  2. asserts EVERY query dumped by Verify has a verdict — a key with a
     dump but no oracle is recorded as rows_only (with its row count),
     never silently dropped,
  3. writes CLOSE_GATE.json (one row per key: match flags + counts),
  4. exits non-zero unless every oracled key matches and every
     rows_only key is non-empty.

Queries compare in a PROCESS POOL: the sequential sweep is ~17 min of
DuckDB CPU (t_textrank's unrolled 8-round CTE oracle alone is ~3 min
at 8 threads), which is both a round-close tax and the one remaining
plausible mechanism for a driver-side compare timing out. The pool
bounds the wall at the longest single oracle.

Usage: python3 tools/close_gate.py [sfDir] [outDir]
       (defaults: /root/testdata/sf0.01 /tmp/verify_out)
Run AFTER `runMain graft.Verify <sfDir> <outDir>` at HEAD.
"""
import json, multiprocessing as mp, os, sys, time
import duckdb
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
DUCK_THREADS = 4


def normalize(df):
    """Column-sort, widen float32 -> float64 (exact), explicit row order.

    Two representation hazards would otherwise fail (or pass) the gate on
    formatting rather than values: float32 (Spark dump) and float64
    (DuckDB oracle) render differently under str() even when the
    underlying value is the same IEEE number, and read_parquet's row
    order follows file-glob order, not the query's ORDER BY, once a dump
    spans multiple part files. Widening float32 to float64 is exact, so
    the compare stays bit-strict; the row sort is the SAME deterministic
    key on both sides, so it cannot mask a value mismatch.
    """
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64)
    if len(df) == 0:
        return df
    key = df.astype(str).apply(lambda r: "\x1f".join(r), axis=1)
    return df.iloc[key.argsort(kind="mergesort")].reset_index(drop=True)


def compare_one(args):
    name, sql = args
    t0 = time.time()
    try:
        con = duckdb.connect()
        con.execute(f"SET threads={DUCK_THREADS}")
        for t in TABLES:
            p = f"{sf}/{t}.parquet"
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        s = con.execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
        if sql is None:
            ok = len(s) > 0
            return name, {"mode": "rows_only", "rows": int(len(s)),
                          "ok": bool(ok)}, not ok, time.time() - t0
        o = normalize(con.execute(sql).fetchdf())
        s = normalize(s)
        rows = len(o) == len(s)
        schema = list(o.columns) == list(s.columns)
        values = (rows and schema and
                  o.astype(str).equals(s.astype(str)))
        rec = {"mode": "oracle", "rows_match": bool(rows),
               "schema_match": bool(schema),
               "values_match": bool(values),
               "rows": int(len(s))}
        return name, rec, not (rows and schema and values), time.time() - t0
    except Exception as e:
        return name, {"mode": "error", "error": str(e)[:200]}, True, \
               time.time() - t0


def main():
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    dumped = sorted(d for d in os.listdir(out)
                    if os.path.isdir(os.path.join(out, d)))
    if not dumped:
        print("CLOSE GATE FAIL: no query dumps under", out)
        sys.exit(1)

    record, fails = {}, []
    workers = max(2, min(8, (os.cpu_count() or 8) // 4))
    tasks = [(n, oracle.get(n)) for n in dumped]
    with mp.Pool(workers) as pool:
        done = 0
        for name, rec, failed, dt in pool.imap_unordered(compare_one, tasks):
            done += 1
            record[name] = rec
            if failed:
                fails.append(name)
            print(f"[gate] {name} {'FAIL' if failed else 'ok'} {dt:.1f}s "
                  f"({done}/{len(tasks)})", file=sys.stderr, flush=True)

    n_oracle = sum(1 for r in record.values() if r.get("mode") == "oracle")
    summary = {"sf": sf, "n_queries": len(record), "n_oracle": n_oracle,
               "n_rows_only": len(record) - n_oracle,
               "n_fail": len(fails), "fails": sorted(fails)}
    with open("CLOSE_GATE.json", "w") as f:
        json.dump({"summary": summary, "queries": record}, f, indent=1,
                  sort_keys=True)
    print(json.dumps(summary))
    if fails:
        print("CLOSE GATE FAIL:", sorted(fails))
        sys.exit(1)
    print(f"CLOSE GATE OK: {n_oracle} oracled + "
          f"{len(record) - n_oracle} rows-only, all green")


if __name__ == "__main__":
    main()
