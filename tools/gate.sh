#!/usr/bin/env bash
# One-shot local gate: everything the per-round driver checks, in order,
# fail-fast. Run from the repo root:
#
#   tools/gate.sh [sfDir]          # default /root/testdata/sf0.01
#
# Stages:
#   1. compile + Test/compile
#   2. sbt test                       (full ScalaTest suite, both state-store providers)
#   3. ScaleGuardSweep                (analysis-time scale contract, whole catalog)
#   4. Verify + DuckDB compare        (full-catalog hash-match, ScaleGuard ON)
#   5. oracle_lint                    (selftest canaries + authoring-time oracle lint)
#   6. metrics_diff                   (shuffle/spill tripwire: headline tier, one
#                                      iteration at sf0.01, metrics vs the pinned
#                                      tools/baselines/metrics_sf001.json — fails on
#                                      >10% shuffle/scan growth or any new spill;
#                                      wall-clock is NOT compared, so a loaded box
#                                      cannot fail this stage)
#   7. exponent gate                  (r9 judge ask #8: scale_exponents --selftest
#                                      always runs — planted exponent-2.0 canary must
#                                      fail, exempted canary must pass; the REAL
#                                      decade gate runs only when GRAFT_EXP_SMALL and
#                                      GRAFT_EXP_BIG point at cached sf0.1 / sf1
#                                      bench artifacts — fails on any headline time
#                                      exponent > 1.3 without a
#                                      tools/baselines/exponent_exemptions.txt +
#                                      COVERAGE.md exemption. Timing-derived, so
#                                      artifact capture belongs on an idle box.)
#   8. combo rows                     (r10 judge ask #6: hostile-data x hostile-
#                                      execution matrix — tools/combo_rows.sh's
#                                      interp / spill / chaoskill configs over the
#                                      adversarial fixture. Env-gated: set
#                                      GRAFT_COMBO=1; ~35 min of full-catalog
#                                      sweeps, so it is standing-but-optional like
#                                      the decade gate.)
#
# Timing bench is intentionally not included (timing work belongs on an idle
# box; run `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Bench"`
# separately and read target/bench.json). After a DELIBERATE plan change,
# regenerate the metrics baseline with the stage-6 command below and commit it.
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.01}
OUT=$(mktemp -d /tmp/graft-gate-XXXX)

echo "== 1/8 compile =="
sbt -batch "compile; Test/compile" >"$OUT/compile.log" 2>&1 \
  || { tail -30 "$OUT/compile.log"; exit 1; }

echo "== 2/8 sbt test =="
sbt -batch test >"$OUT/test.log" 2>&1 \
  || { grep -E "FAILED|Tests: " "$OUT/test.log" | tail -20; exit 1; }
grep -E "Tests: " "$OUT/test.log" | tail -1

echo "== 3/8 ScaleGuardSweep =="
sbt -batch "runMain graft.tools.ScaleGuardSweep /root/testdata/sf0.001" \
  >"$OUT/sweep.log" 2>&1 || { tail -20 "$OUT/sweep.log"; exit 1; }
grep -E "GUARD-FAIL|sweep:" "$OUT/sweep.log" | sed 's/^\[info\] //' | tail -5
grep -q "0 fail" "$OUT/sweep.log" || exit 1

echo "== 4/8 Verify + compare ($SF) =="
sbt -batch "runMain graft.Verify $SF $OUT/verify" >"$OUT/verify.log" 2>&1 \
  || { grep "\[verify\]" "$OUT/verify.log" | tail; exit 1; }
python3 tools/compare.py "$OUT/verify" "$SF" | tail -2
python3 tools/compare.py "$OUT/verify" "$SF" | grep -q " 0 fail" || exit 1

echo "== 5/8 oracle_lint =="
python3 tools/oracle_lint.py --selftest
python3 tools/oracle_lint.py "$OUT/verify" "$SF" "$OUT/verify" | tail -1

echo "== 6/8 metrics_diff (shuffle/spill tripwire) =="
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_ITERS=1 SPARK_GRAFT_BENCH_ALL=0 \
  sbt -batch "runMain graft.Bench" >"$OUT/bench.log" 2>&1 \
  || { tail -20 "$OUT/bench.log"; exit 1; }
python3 tools/metrics_diff.py tools/baselines/metrics_sf001.json \
  target/bench.json 10 | tail -5

echo "== 7/8 exponent gate =="
python3 tools/scale_exponents.py --selftest
if [[ -n "${GRAFT_EXP_SMALL:-}" && -n "${GRAFT_EXP_BIG:-}" ]]; then
  python3 tools/scale_exponents.py --gate "$GRAFT_EXP_SMALL" "$GRAFT_EXP_BIG"
else
  echo "  (decade gate skipped: set GRAFT_EXP_SMALL/GRAFT_EXP_BIG to cached"
  echo "   sf0.1 / sf1 bench artifacts to enforce the 1.3 exponent bar)"
fi

echo "== 8/8 combo rows (hostile data x hostile execution) =="
if [[ "${GRAFT_COMBO:-0}" == "1" ]]; then
  tools/combo_rows.sh target/scala-2.13/classes || exit 1
else
  echo "  (combo rows skipped: set GRAFT_COMBO=1 to run the interp/spill/"
  echo "   chaoskill matrix over the adversarial fixture — ~35 min)"
fi

echo "GATE GREEN ($OUT)"
