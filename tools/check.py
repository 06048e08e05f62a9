#!/usr/bin/env python3
"""Dev-time replica of the driver's correctness gate: run DuckDB on
oracle_sql.json against the same parquet tables and compare with the
Spark results that graft.Verify dumped.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            odf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            sdf = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_bad += 1
            continue
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        schema_ok = ocols == scols
        rows_ok = len(odf) == len(sdf)
        hash_ok = False
        if schema_ok and rows_ok:
            o = sorted(tuple(norm(v) for v in r)
                       for r in odf[ocols].itertuples(index=False))
            s = sorted(tuple(norm(v) for v in r)
                       for r in sdf[scols].itertuples(index=False))
            hash_ok = o == s
            if not hash_ok:
                diff = [(a, b) for a, b in zip(o, s) if a != b][:3]
                print(f"FAIL {name}: value mismatch, first diffs: {diff}")
        if not schema_ok:
            print(f"FAIL {name}: schema {scols} vs oracle {ocols}")
        if not rows_ok:
            print(f"FAIL {name}: rows {len(sdf)} vs oracle {len(odf)}")
        if schema_ok and rows_ok and hash_ok:
            print(f"ok   {name} ({len(sdf)} rows)")
        else:
            n_bad += 1
    print(f"=> {n_bad} failing")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
