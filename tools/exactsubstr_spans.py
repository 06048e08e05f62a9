#!/usr/bin/env python3
"""Exact-substring dedup span recount at x10/x100/x1000 — the third-decade
evidence companion to q_exact_substring_dedup (round 18), in the same spirit
as CONTAINMENT_CANDIDATES.json / PPJOIN_CANDIDATES.json: the operator's
candidate volume recounted exactly in the oracle engine, so the growth ORDER
is measured even where a Spark wall probe would be spill-bound.

Recounts the query's own pipeline: every sliding L=20-token window (identity
64-bit-hashed for the count only — a collision could only ADD a false dup
window, never drop one, and expected collisions << 1 at 175M windows),
min-(doc_id, p) owner election over repeating hashes, non-owner occurrences
merged to maximal spans by the sorted-start interval union, per-doc dup-token
totals. ScaleGen's token-suffix perturbation keeps cross-copy window overlap
at ZERO, so every count must be exactly linear in copies — any super-linear
reading would flag the operator's candidate generator.

Usage: python3 tools/exactsubstr_spans.py [out.json]
"""
import duckdb, json, sys, time

TIERS = [
    ("base_sf0.1", "/root/testdata/sf0.1/documents.parquet"),
    ("x10", "/root/repo/target/scaledata/sf1/documents.parquet/*.parquet"),
    ("x100", "/root/repo/target/scaledata/sf10/documents.parquet/*.parquet"),
    ("x1000", "/root/repo/target/scaledata/sf100/documents.parquet/*.parquet"),
]

L = 20

SETUP = f"""
CREATE OR REPLACE TEMP TABLE win AS
  SELECT doc_id, p, hash(array_to_string(w[p:p+{L - 1}], ' ')) AS wh
  FROM (
    SELECT doc_id, w, unnest(range(1, len(w) - {L - 2})) AS p
    FROM (SELECT doc_id, string_split(text,' ') AS w FROM '{{path}}')
    WHERE len(w) >= {L});
CREATE OR REPLACE TEMP TABLE dup AS
  SELECT w.doc_id, w.p
  FROM win w
  JOIN (SELECT wh, MIN(ROW(doc_id, p)) AS o FROM win GROUP BY wh
        HAVING COUNT(*) > 1) d USING (wh)
  WHERE NOT (ROW(w.doc_id, w.p) = d.o);
"""

COUNTS = f"""
WITH m AS (
  SELECT doc_id, p,
    CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
      OR p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > {L}
      THEN 1 ELSE 0 END AS ns
  FROM dup),
sp AS (
  SELECT doc_id, p, SUM(ns) OVER (PARTITION BY doc_id ORDER BY p) AS span_id
  FROM m),
ag AS (
  SELECT doc_id, span_id, MAX(p) - MIN(p) + {L} AS span_tokens
  FROM sp GROUP BY doc_id, span_id)
SELECT (SELECT count(*) FROM win) AS n_windows,
  (SELECT count(*) FROM dup) AS non_owner_occurrences,
  (SELECT count(DISTINCT doc_id) FROM dup) AS docs_with_dup_spans,
  (SELECT count(*) FROM ag) AS n_dup_spans,
  (SELECT SUM(span_tokens) FROM ag) AS dup_tokens
"""


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/EXACTSUBSTR_SPANS.json"
    con = duckdb.connect()
    con.sql("SET memory_limit='40GB'")
    con.sql("SET temp_directory='/tmp/duckdb_exsub_spill'")
    con.sql("SET max_temp_directory_size='30GB'")
    tiers = {}
    for tag, path in TIERS:
        t0 = time.time()
        for stmt in SETUP.format(path=path).split(";"):
            if stmt.strip():
                con.sql(stmt)
        row = con.sql(COUNTS).fetchone()
        keys = ["n_windows", "non_owner_occurrences", "docs_with_dup_spans",
                "n_dup_spans", "dup_tokens"]
        tiers[tag] = dict(zip(keys, [int(v) for v in row]))
        tiers[tag]["count_sec"] = round(time.time() - t0, 1)
        print(tag, tiers[tag], flush=True)
    base = tiers["base_sf0.1"]
    doc = {
        "metric": "exactsubstr_spans",
        "query": "q_exact_substring_dedup",
        "question": ("round 18: does the sliding-window candidate volume of "
                     "the new ExactSubstr operator stay exactly linear "
                     "through the third decade, as ScaleGen's zero cross-"
                     "copy overlap predicts?"),
        "method": ("exact recount of the query's own pipeline in the oracle "
                   "engine: L=20 sliding windows (identity 64-bit-hashed "
                   "for the count), min-(doc_id,p) owner election over "
                   "repeating hashes, non-owner starts merged to maximal "
                   "spans by the sorted-start interval union"),
        "tiers": tiers,
        "span_ratio_x10": round(tiers["x10"]["n_dup_spans"] / base["n_dup_spans"], 2),
        "span_ratio_x100": round(tiers["x100"]["n_dup_spans"] / base["n_dup_spans"], 2),
        "span_ratio_x1000": round(tiers["x1000"]["n_dup_spans"] / base["n_dup_spans"], 2),
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
