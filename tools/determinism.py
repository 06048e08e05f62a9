#!/usr/bin/env python3
"""Cross-run determinism check (r14 verdict stretch 7c): run graft.Verify
TWICE with different parallelism / shuffle-partition counts and diff every
query's result values. The engine's order-independence discipline (exact
decimal partials, sorted folds, rounded boundaries, total-order tiebreaks)
claims that NO declared query's values depend on partitioning; this makes
the claim mechanical.

Usage:
  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify <sfDir> /tmp/detA"
  SPARK_GRAFT_CPUS=5 sbt -batch "runMain graft.Verify <sfDir> /tmp/detB"
  python3 tools/determinism.py /tmp/detA /tmp/detB [DETERMINISM.json]

With a third argument, writes the repeatable-gate artifact (r15 verdict
item 6): query count, failing names, and the git commit the dumps were
produced from — committed each round as DETERMINISM.json.

Values are compared with the same 9-significant-digit float normalization
as check.py, row-sorted (queries may declare an ORDER BY that leaves ties;
the driver's gate is also order-insensitive).
"""
import json
import math
import subprocess
import sys

import duckdb


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def main():
    dir_a, dir_b = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    names = sorted(json.load(open(f"{dir_a}/oracle_sql.json")))
    n_bad = 0
    bad = []
    for name in names:
        try:
            a = con.sql(f"SELECT * FROM '{dir_a}/{name}/*.parquet'").df()
            b = con.sql(f"SELECT * FROM '{dir_b}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: missing result: {e}")
            n_bad += 1
            bad.append(name)
            continue
        ca, cb = sorted(a.columns), sorted(b.columns)
        if ca != cb or len(a) != len(b):
            print(f"FAIL {name}: shape {len(a)}x{ca} vs {len(b)}x{cb}")
            n_bad += 1
            bad.append(name)
            continue
        ra = sorted(tuple(norm(v) for v in r)
                    for r in a[ca].itertuples(index=False))
        rb = sorted(tuple(norm(v) for v in r)
                    for r in b[cb].itertuples(index=False))
        if ra != rb:
            diff = [(x, y) for x, y in zip(ra, rb) if x != y][:3]
            print(f"FAIL {name}: value drift across partitionings: {diff}")
            n_bad += 1
            bad.append(name)
        else:
            print(f"ok   {name} ({len(a)} rows)")
    print(f"=> {n_bad} nondeterministic")
    if out:
        try:
            commit = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True).stdout.strip()
        except Exception:
            commit = ""
        art = {"metric": "determinism", "commit": commit,
               "n_queries": len(names), "n_nondeterministic": n_bad,
               "failing": bad, "dirs": [dir_a, dir_b]}
        with open(out, "w") as fh:
            json.dump(art, fh)
            fh.write("\n")
        print(f"[determinism] wrote {out}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
