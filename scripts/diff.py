#!/usr/bin/env python3
"""Local pre-verification loop (SURVEY.md §5.2).

Usage: python3 scripts/diff.py [sfDir] [verifyOutDir] [keys...]

Reads each Spark result parquet written by graft.Verify, runs the
matching oracle SQL in DuckDB over the same fixture tables, and
compares (columns sorted by name, exact value equality — the same
shape as the driver's hash compare).
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df

def kind(dt):
    """Collapse a pandas dtype to a representation class. int-vs-float is
    exactly the long/double representation split that breaks the driver's
    value hash even when float(x) == float(y); width (int32 vs int64)
    does not affect the hash, so widths are collapsed."""
    k = np.dtype(dt).kind if not str(dt).startswith("datetime64") else "M"
    return {"i": "int", "u": "int", "f": "float", "b": "bool",
            "M": "ts", "O": "obj"}.get(k, str(dt))

def cmp_col(a, b):
    """Exact compare; returns (ok, detail)."""
    if len(a) != len(b):
        return False, f"len {len(a)} vs {len(b)}"
    for i, (x, y) in enumerate(zip(a, b)):
        xn = x is None or (isinstance(x, float) and np.isnan(x)) or x is pd.NaT
        yn = y is None or (isinstance(y, float) and np.isnan(y)) or y is pd.NaT
        if xn or yn:
            if xn != yn:
                return False, f"row {i}: {x!r} vs {y!r}"
            continue
        if isinstance(x, (np.ndarray, list)) or isinstance(y, (np.ndarray, list)):
            if list(x) != list(y):
                return False, f"row {i}: {x!r} vs {y!r}"
            continue
        if isinstance(x, float) or isinstance(y, float):
            if float(x) != float(y):
                return False, f"row {i}: {x!r} vs {y!r} (d={float(x)-float(y):.3g})"
            continue
        if x != y:
            return False, f"row {i}: {x!r} vs {y!r}"
    return True, ""

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            ddf = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {out}/{name}")
            n_fail += 1
            continue
        sdf = norm(pd.read_parquet(f"{out}/{name}"))
        if list(ddf.columns) != list(sdf.columns):
            print(f"FAIL {name}: cols spark={list(sdf.columns)} duck={list(ddf.columns)}")
            n_fail += 1
            continue
        if len(ddf) != len(sdf):
            print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}")
            n_fail += 1
            continue
        bad = []
        for c in ddf.columns:
            ks, kd = kind(sdf[c].dtype), kind(ddf[c].dtype)
            if ks != kd:
                bad.append(f"{c}: dtype spark={sdf[c].dtype}({ks}) duck={ddf[c].dtype}({kd})")
                continue
            ok, detail = cmp_col(sdf[c].tolist(), ddf[c].tolist())
            if not ok:
                bad.append(f"{c}: {detail}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:3]))
            n_fail += 1
        else:
            print(f"ok   {name} ({len(sdf)} rows)")
            n_ok += 1
    # keys declared without oracle still need a spark output present
    declared = {p.split("/")[-1] for p in glob.glob(f"{out}/*") if not p.endswith(".json")}
    no_oracle = declared - set(oracle)
    if no_oracle:
        print(f"info: declared without oracle: {sorted(no_oracle)}")
    # Coverage assertion (round-6 lesson: absent != pass). Every key in
    # COVERAGE.md (pinned == SparkEntry.queries by EntrySpec) must have
    # a Spark output dir — a key that crashed in Verify writes nothing
    # and must FAIL the loop, oracle or omit alike. Skipped when a key
    # filter is given (fast single-key iteration).
    if not only:
        import re
        try:
            cov = open("/root/repo/COVERAGE.md").read()
            all_keys = set(re.findall(r"^\| `([a-z0-9_]+)` \|", cov, re.M))
            missing = all_keys - declared
            if missing:
                print(f"FAIL coverage: {len(missing)} declared keys with no Verify output: {sorted(missing)[:10]}...")
                n_fail += len(missing)
            extra = declared - all_keys
            if extra:
                print(f"FAIL coverage: outputs not in COVERAGE.md: {sorted(extra)}")
                n_fail += len(extra)
        except FileNotFoundError:
            print("WARN coverage: COVERAGE.md not found, skipping coverage assertion")
    print(f"== {n_ok} ok, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
