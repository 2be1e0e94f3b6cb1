#!/usr/bin/env python3
"""Targeted oracle compare: like check.py but only for the named queries.

Usage: check_subset.py OUT_DIR SF_DIR QUERY [QUERY...]
Builder-side iteration helper; the driver's gate stays tools/check.py.
"""
import glob
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(out_dir, sf_dir, names):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    ok = True
    for name in names:
        if name not in oracle:
            print(f"FAIL {name}: no oracle entry")
            ok = False
            continue
        files = sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))
        if not files:
            print(f"FAIL {name}: MISSING_SPARK_OUTPUT")
            ok = False
            continue
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        want = con.execute(oracle[name]).fetchdf()
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: SCHEMA spark={list(got.columns)} oracle={list(want.columns)}")
            ok = False
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: ROWS spark={len(got)} oracle={len(want)}")
            ok = False
            continue
        dt = [(c, str(got[c].dtype), str(want[c].dtype)) for c in got.columns
              if got[c].dtype.kind != want[c].dtype.kind]
        if dt:
            print(f"FAIL {name}: DTYPE-KIND {dt}")
            ok = False
            continue
        mismatch = None
        for c in got.columns:
            for i, (x, y) in enumerate(zip(got[c].tolist(), want[c].tolist())):
                if x != y and str(x) != str(y):
                    mismatch = f"CELL {c}[{i}]: spark={x!r} oracle={y!r}"
                    break
            if mismatch:
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}")
            ok = False
        else:
            print(f"PASS {name}: OK (n={len(got)})")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
