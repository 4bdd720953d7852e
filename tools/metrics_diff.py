#!/usr/bin/env python3
"""Round-over-round shuffle-discipline diff for bench artifacts.

Usage: tools/metrics_diff.py OLD_bench.json NEW_bench.json [pct]

Compares `queries_metrics` (and `queries_all_metrics` when both sides
have it) between two `target/bench.json` artifacts and prints every
query whose shuffle read/write bytes, shuffle records, or scan input
bytes moved by more than `pct` percent (default 10), plus ANY query
that newly spills. This is the regression tripwire the wall-clock
numbers can't be: a broadcast join degrading to a shuffle, a scan
losing column pruning, or a map-side combine stopping combining moves
these counters deterministically even when timing noise hides it.

Exit code 1 if any regression (increase beyond threshold / new spill)
was found, 0 otherwise. Decreases are printed as improvements but do
not fail.
"""
import json
import sys


WATCHED = ["shuf_read", "shuf_write", "shuf_recs", "input_bytes"]
SPILL = ["spill_mem", "spill_disk"]


def diff_tier(old, new, pct, tier):
    regressions = 0
    for q in sorted(set(old) & set(new)):
        o, n = old[q], new[q]
        for k in WATCHED:
            ov, nv = o.get(k, 0), n.get(k, 0)
            if ov == nv:
                continue
            base = max(ov, 1)
            move = 100.0 * (nv - ov) / base
            if abs(move) > pct:
                tag = "REGRESSION" if nv > ov else "improvement"
                print(f"[{tier}] {q}.{k}: {ov} -> {nv} ({move:+.1f}%) {tag}")
                if nv > ov:
                    regressions += 1
        for k in SPILL:
            if n.get(k, 0) > 0 and o.get(k, 0) == 0:
                print(f"[{tier}] {q}.{k}: NEW SPILL {n[k]} bytes REGRESSION")
                regressions += 1
    only_new = set(new) - set(old)
    if only_new:
        print(f"[{tier}] new queries (no baseline): {len(only_new)}")
    return regressions


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    with open(sys.argv[1]) as f:
        old = json.load(f)
    with open(sys.argv[2]) as f:
        new = json.load(f)
    pct = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    bad = 0
    for key, tier in [("queries_metrics", "headline"),
                      ("queries_all_metrics", "all")]:
        if key in old and key in new:
            bad += diff_tier(old[key], new[key], pct, tier)
        else:
            print(f"[{tier}] {key} missing on one side — skipped")
    print(f"{bad} regression(s)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
