#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query directory under <verifyOutDir>: read the Spark parquet
result, run the matching oracle SQL from oracle_sql.json in DuckDB with
views named after the tables in <sfDir>, sort columns by name, and
compare row-for-row (doubles exact — mirrors hash matching).
"""
import json, sys, glob, math
import duckdb

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet({files!r})").df()
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} vs {wc}"); n_fail += 1; continue
        got, want = got[gc], want[wc]
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1; continue
        ok = True
        for c in gc:
            a, b = got[c].tolist(), want[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                same = (x == y)
                if not same:
                    try:
                        import pandas as pd
                        same = bool(pd.isna(x)) and bool(pd.isna(y))
                    except (TypeError, ValueError):
                        same = False
                if not same:
                    print(f"FAIL {name}: col {c} row {i}: {x!r} vs {y!r}")
                    ok = False; break
            if not ok: break
        if ok:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
