#!/usr/bin/env python3
"""Time the DuckDB oracle suite — the bench contract's denominator.

Usage: python3 tools/time_oracle.py <sfDir> <verifyOutDir>

Runs every oracle SQL from <verifyOutDir>/oracle_sql.json against
views over <sfDir> and prints the total plus the slowest 10, so the
BASELINE.md accounting can cite a measured number instead of the
judge's one-off. (Results are fetched but not compared — check.py is
the correctness gate; this is the stopwatch.)
"""
import json, sys, time
import duckdb

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name in sorted(oracle):
        t0 = time.time()
        try:
            con.execute(oracle[name]).fetchall()
            times[name] = time.time() - t0
        except Exception as e:
            times[name] = time.time() - t0
            print(f"ERR {name}: {str(e)[:120]}")
    total = sum(times.values())
    print(f"== DuckDB oracle suite: {total:.1f} s over {len(times)} queries")
    for name, t in sorted(times.items(), key=lambda kv: -kv[1])[:10]:
        print(f"  {t:6.2f}  {name}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
