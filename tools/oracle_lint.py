#!/usr/bin/env python3
"""Authoring-time type lint for the oracle catalog.

The driver's hash compare is type-sensitive; three failures across two
rounds (q145, q227, q262) were oracle-SIDE type artifacts — HUGEINT from
un-cast DuckDB sums / window sums, and DOUBLE from DuckDB `floor` where
Spark emits an integral. This lint catches the class at authoring time,
before a full Verify run:

  1. Any result column whose DuckDB type is HUGEINT  -> FAIL (DuckDB's
     128-bit sum type; Spark has no counterpart, always a missing cast).
  2. If the Spark parquet dump for the query exists in <outdir>, any
     column where DuckDB says DOUBLE/FLOAT but Spark's parquet is
     integral (or vice versa)                        -> FAIL.

Usage:
    sbt "runMain graft.Verify /root/testdata/sf0.001 /tmp/lint --sql-only"
    python3 tools/oracle_lint.py /tmp/lint /root/testdata/sf0.001 [verify_outdir]

<outdir> must contain oracle_sql.json; the optional third arg points at a
prior full Verify dump for the cross-check (defaults to <outdir> itself).
"""
import json
import os
import sys

import duckdb

outdir, sfdir = sys.argv[1], sys.argv[2]
dumpdir = sys.argv[3] if len(sys.argv) > 3 else outdir
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

INTEGRAL = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
            "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}


def is_floating(t):
    # DECIMAL included: pandas materializes it as float64, so a DECIMAL
    # oracle against an integral Spark column is the same dtype mismatch
    return t in ("FLOAT", "DOUBLE") or t.startswith("DECIMAL")

n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    try:
        rel = con.sql(sql)
        otypes = {c: str(t).upper() for c, t in zip(rel.columns, rel.types)}
    except Exception as e:
        print(f"FAIL {name}: oracle exec error: {str(e)[:200]}")
        n_fail += 1
        continue
    problems = [f"col {c}: oracle type HUGEINT (add a CAST)"
                for c, t in otypes.items() if t == "HUGEINT"]
    spark_dump = f"{dumpdir}/{name}"
    if os.path.isdir(spark_dump):
        try:
            srel = con.sql(f"SELECT * FROM '{spark_dump}/*.parquet'")
            stypes = {c: str(t).upper()
                      for c, t in zip(srel.columns, srel.types)}
            for c, ot in otypes.items():
                st = stypes.get(c)
                if st is None:
                    continue  # column-set mismatch is compare.py's job
                if is_floating(ot) and st in INTEGRAL:
                    problems.append(
                        f"col {c}: oracle {ot} but Spark {st} (floor/"
                        f"division artifact — cast the oracle)")
                elif ot in INTEGRAL and is_floating(st):
                    problems.append(
                        f"col {c}: oracle {ot} but Spark {st} (cast one side)")
        except Exception as e:
            problems.append(f"spark dump unreadable: {str(e)[:120]}")
    if problems:
        print(f"FAIL {name}: " + "; ".join(problems))
        n_fail += 1
    else:
        n_pass += 1

print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
