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
            grel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            wrel = con.sql(oracle[name])
            # TYPE-STRICT gate (round-10 lesson: 0 == 0.0 passed two
            # driver reds). Any HUGEINT or DECIMAL result column on
            # either side is a fail BEFORE values are compared: those
            # types degrade to float64/object in result paths and the
            # driver's value hash diverges on representation even when
            # every value is identical.
            bad = [(side, c, str(t))
                   for side, rel in (("spark", grel), ("oracle", wrel))
                   for c, t in zip(rel.columns, rel.types)
                   if str(t) == "HUGEINT" or str(t).startswith("DECIMAL")]
            if bad:
                print(f"FAIL {name}: banned result types {bad}")
                n_fail += 1; continue
            got, want = grel.df(), wrel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} vs {wc}"); n_fail += 1; continue
        got, want = got[gc], want[wc]
        # dtype-strict: int-vs-float (and int/float-vs-object) is a
        # hash mismatch at the driver even when the values compare
        # equal in Python. Integer WIDTHS are normalized — the driver's
        # value hash provably tolerates int32 vs int64 (six r10
        # hash-green rows differ only there).
        def canon(d):
            d = str(d)
            return "int64" if d in ("int8", "int16", "int32") else d
        dt = [(c, str(got[c].dtype), str(want[c].dtype)) for c in gc
              if canon(got[c].dtype) != canon(want[c].dtype)]
        if dt:
            print(f"FAIL {name}: dtype mismatch {dt}"); n_fail += 1
            continue
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
