#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare: runs each
SparkEntry.oracleSql query in DuckDB over the sf parquet tables and compares
row/schema/values with the engine's parquet output (columns sorted by name,
rows sorted, exact value equality).

Usage: python3 tools/check_oracles.py /tmp/verify_out /root/testdata/sf0.01
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd


def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for q, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{q}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {q}: no engine output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files])
        want = con.execute(sql).df()
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {q}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {q}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        # dtype-strict value compare: the driver hashes the STRING rendering
        # of every cell, so numerically-equal values with different dtypes
        # (DuckDB HUGEINT -> pandas float64: "296.0" vs engine int64 "296")
        # must FAIL here too — a tolerant compare hid exactly that class in
        # round 2 (p06/x02/x03). Require equal value AND equal rendering.
        mismatch = None
        for c in g.columns:
            a, b = g[c].tolist(), w[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                both_na = (not isinstance(x, (list, tuple)) and pd.isna(x)) and \
                          (not isinstance(y, (list, tuple)) and pd.isna(y))
                same = both_na or (x == y and str(x) == str(y))
                if not same:
                    mismatch = (c, i, x, y)
                    break
            if mismatch:
                break
        if mismatch:
            c, i, x, y = mismatch
            print(f"FAIL {q}: col {c} row {i}: engine={x!r} oracle={y!r}")
            n_fail += 1
        else:
            print(f"PASS {q} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
