#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: oracle_check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the sf_dir parquet
tables, sorts columns by name, sorts rows, and compares values.
Mirrors the driver's compare closely enough to iterate locally.
"""
import json, sys, math, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize temporal/decimal-ish types to strings for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith(("datetime", "date")):
            df[c] = df[c].astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                                hasattr(v, "__len__") and not isinstance(v, str) else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def close(a, b):
    # EXACT compare: the driver hashes values, so a 1-ulp float gap is a
    # fail there — a tolerance here hid q_tpch_q10's mismatch in round 2.
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    results = sorted(d for d in os.listdir(out_dir)
                     if os.path.isdir(os.path.join(out_dir, d)))
    for name in results:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        got = canon(pd.concat([pd.read_parquet(f) for f in files])
                    if files else pd.DataFrame())
        if name not in oracles:
            print(f"[rows-only] {name}: rows={len(got)}")
            continue
        try:
            exp = canon(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ok = list(got.columns) == list(exp.columns) and len(got) == len(exp)
        detail = ""
        if ok:
            for c in got.columns:
                for i, (a, b) in enumerate(zip(got[c], exp[c])):
                    if not close(a, b):
                        ok, detail = False, f"col {c} row {i}: got={a!r} exp={b!r}"
                        break
                if not ok:
                    break
        else:
            detail = (f"schema/rows: got cols={list(got.columns)} rows={len(got)} "
                      f"exp cols={list(exp.columns)} rows={len(exp)}")
        print(f"[{'PASS' if ok else 'FAIL'}] {name}" + (f": {detail}" if detail else ""))
        n_pass += ok; n_fail += (not ok)
    missing = [k for k in oracles if k not in results]
    for k in missing:
        print(f"[FAIL] {k}: oracle declared but no result written")
        n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(results)} results ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
