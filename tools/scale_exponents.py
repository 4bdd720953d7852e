#!/usr/bin/env python3
"""Measured scaling exponents between two bench artifacts a decade apart
(the r9 sf0.1 -> sf1 probe). For each query present in both artifacts'
`queries` maps: exponent = log(t_big / t_small) / log(ratio); same for
the shuffle-write bytes and scan input bytes in `queries_metrics`.

An exponent of 1.0 is linear scaling, < 1 means fixed overhead still
dominates at the small scale, and anything much above ~1.3 on TIME is a
super-linear query that deserves a finding (docs/OPERATORS.md states
each operator's predicted shape). Byte exponents are the honest
plan-shape signal — they have no JVM/warmup noise.

Usage: tools/scale_exponents.py SMALL_bench.json BIG_bench.json [ratio]
  ratio defaults to 10.
"""
import json
import math
import sys


def main():
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    lg = math.log(ratio)
    qs = sorted(set(small["queries"]) & set(big["queries"]))
    sm, bm = small.get("queries_metrics", {}), big.get("queries_metrics", {})

    def exp(a, b):
        if a is None or b is None or a <= 0 or b <= 0:
            return None
        return math.log(b / a) / lg

    rows = []
    for q in qs:
        t = exp(small["queries"][q], big["queries"][q])
        sw = exp(sm.get(q, {}).get("shuf_write"), bm.get(q, {}).get("shuf_write"))
        ib = exp(sm.get(q, {}).get("input_bytes"), bm.get(q, {}).get("input_bytes"))
        rows.append((q, t, sw, ib))

    def f(v):
        return "   -" if v is None else f"{v:4.2f}"

    print(f"{'query':<34} {'t_exp':>5} {'shufW_exp':>9} {'input_exp':>9}   "
          f"t_small->t_big")
    flagged = []
    for q, t, sw, ib in sorted(rows, key=lambda r: -(r[1] or 0)):
        mark = ""
        if t is not None and t > 1.3:
            mark = "  <-- SUPER-LINEAR"
            flagged.append(q)
        print(f"{q:<34} {f(t):>5} {f(sw):>9} {f(ib):>9}   "
              f"{small['queries'][q]:6.2f}s -> {big['queries'][q]:7.2f}s{mark}")
    print(f"\ntotals: {small['value']:.1f}s -> {big['value']:.1f}s "
          f"(exp {exp(small['value'], big['value']):.2f}); "
          f"{len(flagged)} super-linear: {flagged}")


if __name__ == "__main__":
    main()
