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

Usage:
  tools/scale_exponents.py SMALL_bench.json BIG_bench.json [ratio]
      Render the full table (report mode; always exits 0).
  tools/scale_exponents.py --gate SMALL_bench.json BIG_bench.json [ratio]
      Gate mode (r9 judge ask #8): exit 1 if any query's TIME exponent
      exceeds GATE_BAR (1.3) and the query is not listed in
      tools/baselines/exponent_exemptions.txt (each entry there must
      carry a COVERAGE.md explanation row). Run by gate.sh stage 7 when
      a cached sf1 bench artifact is available.
  tools/scale_exponents.py --selftest
      Prove the gate logic on planted artifacts: a linear catalog must
      pass, a planted exponent-2.0 canary must fail, and the same canary
      exempted must pass. Always run (cheap, synthetic) by gate.sh so
      the gate cannot silently stop firing.

ratio defaults to 10.
"""
import json
import math
import os
import sys

GATE_BAR = 1.3
EXEMPT_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "baselines", "exponent_exemptions.txt")


def load_exemptions(path=EXEMPT_FILE):
    if not os.path.exists(path):
        return set()
    out = set()
    for line in open(path):
        line = line.strip()
        if line and not line.startswith("#"):
            out.add(line)
    return out


def exponents(small, big, ratio):
    """[(query, t_exp, shufW_exp, input_exp)] for shared queries."""
    lg = math.log(ratio)
    qs = sorted(set(small["queries"]) & set(big["queries"]))
    sm, bm = small.get("queries_metrics", {}), big.get("queries_metrics", {})

    def exp(a, b):
        if a is None or b is None or a <= 0 or b <= 0:
            return None
        return math.log(b / a) / lg

    return [(q,
             exp(small["queries"][q], big["queries"][q]),
             exp(sm.get(q, {}).get("shuf_write"), bm.get(q, {}).get("shuf_write")),
             exp(sm.get(q, {}).get("input_bytes"), bm.get(q, {}).get("input_bytes")))
            for q in qs], exp


def report(small, big, ratio):
    rows, exp = exponents(small, big, ratio)

    def f(v):
        return "   -" if v is None else f"{v:4.2f}"

    print(f"{'query':<34} {'t_exp':>5} {'shufW_exp':>9} {'input_exp':>9}   "
          f"t_small->t_big")
    flagged = []
    for q, t, sw, ib in sorted(rows, key=lambda r: -(r[1] or 0)):
        mark = ""
        if t is not None and t > GATE_BAR:
            mark = "  <-- SUPER-LINEAR"
            flagged.append(q)
        print(f"{q:<34} {f(t):>5} {f(sw):>9} {f(ib):>9}   "
              f"{small['queries'][q]:6.2f}s -> {big['queries'][q]:7.2f}s{mark}")
    print(f"\ntotals: {small['value']:.1f}s -> {big['value']:.1f}s "
          f"(exp {exp(small['value'], big['value']):.2f}); "
          f"{len(flagged)} super-linear: {flagged}")
    return flagged


def gate(small, big, ratio, exempt, bar=GATE_BAR):
    rows, _ = exponents(small, big, ratio)
    offenders = [(q, t) for q, t, _, _ in rows
                 if t is not None and t > bar and q not in exempt]
    waived = [(q, t) for q, t, _, _ in rows
              if t is not None and t > bar and q in exempt]
    for q, t in waived:
        print(f"[exp-gate] waived {q} t_exp={t:.2f} (exemption on file)")
    if offenders:
        for q, t in offenders:
            print(f"[exp-gate] FAIL {q} t_exp={t:.2f} > {bar} and not in "
                  f"{os.path.relpath(EXEMPT_FILE)} — super-linear scaling "
                  f"needs a fix or a COVERAGE-documented exemption")
        return 1
    print(f"[exp-gate] OK: {len(rows)} queries <= {bar} "
          f"({len(waived)} documented exemptions)")
    return 0


def selftest():
    def art(times):
        return {"metric": "total", "value": sum(times.values()),
                "unit": "sec", "queries": times}

    linear_small = art({"q1": 1.0, "q2": 2.0})
    linear_big = art({"q1": 10.0, "q2": 24.0})      # exps 1.00, 1.08
    canary_big = art({"q1": 10.0, "q2": 200.0})     # q2 exp 2.0

    fails = []
    if gate(linear_small, linear_big, 10.0, set()) != 0:
        fails.append("linear catalog flagged")
    if gate(linear_small, canary_big, 10.0, set()) != 1:
        fails.append("planted exponent-2.0 canary NOT flagged")
    if gate(linear_small, canary_big, 10.0, {"q2"}) != 0:
        fails.append("exempted canary still flagged")
    # stress-tier bar: a designed-quadratic row passes its own 2.1 bar
    # with NO exemption, and a worse-than-designed regression fails it
    stress_big = art({"q1": 10.0, "q2": 400.0})     # q2 exp 2.3
    if gate(linear_small, canary_big, 10.0, set(), bar=2.1) != 0:
        fails.append("designed-quadratic stress row flagged at bar 2.1")
    if gate(linear_small, stress_big, 10.0, set(), bar=2.1) != 1:
        fails.append("worse-than-designed stress regression NOT flagged")
    # the real exemption file must exist, parse, and carry the
    # COVERAGE-documented entries — a deleted/emptied file would
    # otherwise silently turn the waivers into hard failures mid-round.
    # (q47 was dropped from the list in r10: its r9 1.59 was the marker
    # fixture's collapsed shingle entropy; re-measured 1.07 on the
    # entropy-exact v4 fixture.)
    real = load_exemptions()
    for q in ("q30_embedding_near_dup", "q84_interval_attribution"):
        if q not in real:
            fails.append(f"exemption file missing documented entry {q}")
    if fails:
        print("[exp-gate] SELFTEST FAIL: " + "; ".join(fails))
        return 1
    print("[exp-gate] selftest OK (5 gate cases + exemption file)")
    return 0


def main():
    args = sys.argv[1:]
    if args and args[0] == "--selftest":
        sys.exit(selftest())
    gating = bool(args) and args[0] == "--gate"
    if gating:
        args = args[1:]
    # --bar X: tier-specific exponent bar (the STRESS tier gates at its
    # own bar with NO exemptions — q30's no-prune regime is ~n^2 BY
    # CONSTRUCTION, so its bar is "no worse than the designed quadratic"
    # rather than the headline 1.3; an exemption there would make the
    # stress gate vacuous, exactly what the tier split exists to avoid).
    bar, exempt = GATE_BAR, None
    while args and args[0] in ("--bar", "--no-exempt"):
        if args[0] == "--bar":
            bar = float(args[1])
            args = args[2:]
        else:
            exempt = set()
            args = args[1:]
    small = json.load(open(args[0]))
    big = json.load(open(args[1]))
    ratio = float(args[2]) if len(args) > 2 else 10.0
    if gating:
        sys.exit(gate(small, big, ratio,
                      load_exemptions() if exempt is None else exempt, bar))
    report(small, big, ratio)


if __name__ == "__main__":
    main()
