#!/usr/bin/env python3
"""Test-power audit of the correctness catalog (r5 'next round' item 7).

q145 passed three rounds while every OOV rate it computed was identically
0 — the oracle agreed, so the gate was green, but the query exercised
nothing. This sweep flags that failure class across the whole catalog:
for each query's Verify parquet dump, any NON-KEY result column whose
values are all identical (single distinct value, nulls included) at
sf0.01 has near-zero test power against its oracle — a bug that flips
that column's formula would still hash-match.

Heuristics to keep the signal useful:
  - single-row results (profiling shape checks, chi-square one-rowers)
    are skipped — a one-row frame trivially has one distinct value per
    column, but its VALUE is still fully checked by the oracle;
  - columns that look like group keys / ids (name endswith _id, _key, or
    equals a known dimension column) are not flagged: constancy there is
    a fixture property, not a power gap;
  - the flag lists the constant value so degenerate-but-meaningful cases
    (e.g. a correctly-all-zero violation counter on clean data) can be
    triaged by eye. The output is a report, not a gate.

Usage: python3 tools/power_audit.py /tmp/verify_out
"""
import glob
import os
import sys

import duckdb

KEYISH = ("_id", "_key", "_bucket", "lang", "source", "event_type",
          "r", "c", "g", "g_a", "g_b", "node", "src", "dst")

outdir = sys.argv[1]
con = duckdb.connect()

flagged = 0
queries = sorted(d for d in os.listdir(outdir)
                 if os.path.isdir(os.path.join(outdir, d)))
for name in queries:
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        continue
    rel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
    n = con.sql(f"SELECT count(*) FROM '{outdir}/{name}/*.parquet'").fetchone()[0]
    if n <= 1:
        continue
    consts = []
    for col in rel.columns:
        if col.lower().endswith(KEYISH) or col.lower() in KEYISH:
            continue
        d, v = con.sql(
            f'SELECT count(DISTINCT "{col}"), min("{col}") '
            f"FROM '{outdir}/{name}/*.parquet'").fetchone()
        nulls = con.sql(
            f'SELECT count(*) FROM \'{outdir}/{name}/*.parquet\' '
            f'WHERE "{col}" IS NULL').fetchone()[0]
        # all-NULL counts as constant too (count DISTINCT excludes NULL)
        if (d == 1 and nulls == 0) or (d == 0 and nulls == n):
            consts.append((col, v if nulls == 0 else None))
    if consts:
        flagged += 1
        cols = ", ".join(f"{c}={v!r}" for c, v in consts)
        print(f"LOW-POWER {name} ({n} rows): {cols}")

print(f"\n{flagged} of {len(queries)} queries have a constant non-key "
      f"result column at this SF")
