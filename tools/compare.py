#!/usr/bin/env python3
"""Local pre-validation of the driver's correctness gate.

Mimics the driver: run Verify's parquet dumps against the DuckDB oracle in
oracle_sql.json; for each query sort columns by name, sort rows, and compare
row count, schema and exact values. Usage:

    python3 tools/compare.py OUTDIR SFDIR [--only a,b] [--skip a,b]
                             [--timeout SECS]

--timeout interrupts any single oracle query running longer than SECS
(reported as TIMEOUT, counted as neither pass nor fail but listed) — for
the sf1 sweep, where a handful of deliberately-quadratic all-pairs
oracles (exact pair scans over 5·10^5 docs) cannot finish and become the
documented blocker list instead.
"""
import json
import math
import sys
import threading

import duckdb
import pandas as pd

positional, flags = [], {}
argv = sys.argv[1:]
i = 0
while i < len(argv):
    a = argv[i]
    if a.startswith("--"):
        if "=" in a:
            k, v = a.split("=", 1)
            flags[k] = v
        else:
            flags[a] = argv[i + 1]
            i += 1
    else:
        positional.append(a)
    i += 1
outdir, sfdir = positional[0], positional[1]
only = set(flags["--only"].split(",")) if "--only" in flags else None
skip = set(flags["--skip"].split(",")) if "--skip" in flags else set()
timeout_s = float(flags["--timeout"]) if "--timeout" in flags else None
threads = int(flags["--threads"]) if "--threads" in flags else None
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
if threads:
    con.sql(f"SET threads TO {threads}")
# Bounded DuckDB resources for the sf1 sweep (r11: q325's oracle filled
# the box's disk quota with spill temp): --duck-mem caps the buffer pool,
# --duck-tmp routes spill to an explicit directory (point it somewhere
# with known headroom; an empty value disables spilling entirely).
if "--duck-mem" in flags:
    con.sql(f"SET memory_limit='{flags['--duck-mem']}'")
if "--duck-tmp" in flags:
    con.sql(f"SET temp_directory='{flags['--duck-tmp']}'")
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    # scalar missing values beyond None/float-NaN: pandas NaT (null
    # timestamps, e.g. an outer join's unmatched side) never equals
    # itself under ==; treat both-missing as equal like the driver's
    # hash does. Guarded: pd.isna on array cells returns an array.
    try:
        an, bn = pd.isna(a), pd.isna(b)
        if an is True and bn is True:
            return True
    except (TypeError, ValueError):
        pass
    return a == b

def sql_df(q):
    """con.sql(q).df(), interrupted after --timeout seconds."""
    if timeout_s is None:
        return con.sql(q).df()
    box = {}

    def work():
        try:
            box["v"] = con.sql(q).df()
        except Exception as e:  # noqa: BLE001 — re-raised below
            box["e"] = e

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        con.interrupt()
        t.join()
        raise TimeoutError(f"oracle exceeded {timeout_s:.0f}s (interrupted)")
    if "e" in box:
        raise box["e"]
    return box["v"]


n_pass = n_fail = 0
timeouts = []
for name, sql in sorted(oracle.items()):
    if (only is not None and name not in only) or name in skip:
        continue
    try:
        got = canon(sql_df(f"SELECT * FROM '{outdir}/{name}/*.parquet'"))
        want = canon(sql_df(sql))
    except TimeoutError as e:
        print(f"TIMEOUT {name}: {e}")
        timeouts.append(name)
        continue
    except Exception as e:
        print(f"FAIL {name}: exec error: {str(e)[:200]}")
        n_fail += 1
        continue
    problems = []
    if list(got.columns) != list(want.columns):
        problems.append(f"columns {list(got.columns)} vs {list(want.columns)}")
    elif len(got) != len(want):
        problems.append(f"rows {len(got)} vs {len(want)}")
    else:
        # Type-strict on dtype KIND: the driver's hash distinguishes int
        # vs float vs object, so Python == equality is not enough —
        # 2 == 2.0 passed locally while the driver failed (q145/q227/q262
        # class). Integer WIDTH (int32 vs int64) is provably invisible to
        # the driver's hash: 16 catalog queries ship an int32 Spark column
        # against a DuckDB int64 and have been hash-green for rounds.
        def kind(dt):
            s = str(dt)
            return "int" if s.startswith(("int", "uint")) else s
        for c in got.columns:
            gk, wk = kind(got[c].dtype), kind(want[c].dtype)
            if gk != wk:
                problems.append(
                    f"col {c}: dtype {got[c].dtype} vs {want[c].dtype}")
        for c in got.columns:
            gv, wv = got[c].tolist(), want[c].tolist()
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(gv, wv)) if not cell_eq(a, b)]
            if bad:
                i, a, b = bad[0]
                problems.append(f"col {c}: {len(bad)} diffs, first at row {i}: {a!r} vs {b!r}")
    if problems:
        print(f"FAIL {name}: " + "; ".join(problems))
        n_fail += 1
    else:
        print(f"PASS {name} ({len(got)} rows x {len(got.columns)} cols)")
        n_pass += 1

tm = f", {len(timeouts)} timeout ({','.join(timeouts)})" if timeouts else ""
print(f"\n{n_pass} pass, {n_fail} fail{tm}")
sys.exit(1 if n_fail else 0)
