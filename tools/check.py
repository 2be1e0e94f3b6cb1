#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check.py <outDir> <sfDir>
  <outDir> must contain <name>/ parquet dirs written by graft.Verify plus
  oracle_sql.json. Registers every testdata table as a DuckDB view, runs
  each oracle SQL, and compares against the Spark result: column names
  (sorted), row count, and cell-exact values (ordered).
"""
import json, sys, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name in sorted(oracle):
        # sorted: multi-part Spark outputs must be read in part-number order
        # or the ordered cell compare fails spuriously (ADVICE r1)
        files = sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))
        if not files:
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {e}"
            continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            results[name] = f"SCHEMA: spark={list(got.columns)} oracle={list(want.columns)}"
            continue
        if len(got) != len(want):
            results[name] = f"ROWS: spark={len(got)} oracle={len(want)}"
            continue
        # kind-strict: DuckDB SUM(BIGINT) comes back HUGEINT -> float64,
        # which python equality (506627 == 506627.0) hides but the driver's
        # value hash does not (stringifies as '506627.0' vs '506627').
        # Same-kind width differences (int32 vs int64) stringify identically
        # and are fine; int-vs-float is the driver-visible breakage.
        dt = [(c, str(got[c].dtype), str(want[c].dtype)) for c in got.columns
              if got[c].dtype.kind != want[c].dtype.kind]
        if dt:
            results[name] = f"DTYPE-KIND: {dt}"
            continue
        mismatch = None
        for c in got.columns:
            a, b = got[c].tolist(), want[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y and str(x) != str(y):
                    mismatch = f"CELL {c}[{i}]: spark={x!r} oracle={y!r}"
                    break
            if mismatch:
                break
        results[name] = mismatch or "OK"
    ok = all(v == "OK" for v in results.values())
    for k, v in results.items():
        print(f"{'PASS' if v == 'OK' else 'FAIL'} {k}: {v}")
    # queries with no oracle: rows-only check
    for d in sorted(glob.glob(os.path.join(out_dir, "*", ""))):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracle:
            files = glob.glob(os.path.join(d, "*.parquet"))
            n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
            print(f"{'PASS' if n > 0 else 'FAIL'} {name}: rows-only n={n}")
            ok = ok and n > 0
    sys.exit(0 if ok else 1)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
