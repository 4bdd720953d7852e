#!/usr/bin/env bash
# Idle-box companion bench (r9 judge ask #6): the driver's per-round
# BENCH_r{N}.json runs on a box it is also driving (r8 spread 1.66, r9
# 1.23 — load-contaminated by its own telemetry's admission), so each
# round ALSO pins a named builder-side min-of-5 sf0.1 artifact captured
# when the box is idle. This script refuses to time on a busy box,
# runs the headline tier, checks the iteration spread, and pins the
# artifact by round name next to the history copies.
#
# Usage: tools/bench_idle.sh ROUND_TAG [sfDir] [iters]
#   e.g. tools/bench_idle.sh r10             -> bench_idle_r10.json (min-of-5)
#        tools/bench_idle.sh r11sf1 /tmp/sf1 3 -> the DECADE leg, min-of-3
#          (r10 judge ask #8: the sf1 artifact the stage-7 exponent gate
#           consumes was min-of-1 — a one-sample exponent; 3 iterations
#           give the same min-estimator discipline as the sf0.1 leg at
#           ~40 min instead of ~65)
#        GRAFT_BENCH_STRESS=only tools/bench_idle.sh r13close_sf1_stress /tmp/sf1 3
#          -> the STRESS tier (q30's no-prune regime) as its own pinned
#           artifact (r12 judge ask #4: it was 71% of the sf1 headline
#           leg; split out so headline totals compare round-over-round)
# Env: GRAFT_BENCH_MAX_LOAD (default 4.0), GRAFT_BENCH_STRESS (=only for
#      the stress tier).
set -euo pipefail
cd "$(dirname "$0")/.."
TAG=${1:?usage: tools/bench_idle.sh ROUND_TAG [sfDir] [iters]}
SF=${2:-/root/testdata/sf0.1}
ITERS=${3:-5}
MAXLOAD=${GRAFT_BENCH_MAX_LOAD:-4.0}

load=$(cut -d' ' -f1 /proc/loadavg)
awk -v l="$load" -v m="$MAXLOAD" 'BEGIN{exit !(l<=m)}' \
  || { echo "box not idle (load $load > $MAXLOAD) — refusing to time"; exit 1; }

SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_ITERS="$ITERS" \
  SPARK_GRAFT_BENCH_STRESS="${GRAFT_BENCH_STRESS:-}" \
  sbt -batch "runMain graft.Bench" \
  >/tmp/bench_idle_"$TAG".log 2>&1 \
  || { tail -20 /tmp/bench_idle_"$TAG".log; exit 1; }

DEST="target/bench_history/bench_idle_${TAG}.json"
mkdir -p target/bench_history
cp target/bench.json "$DEST"
# round-durable copy: target/ is wiped at round boundaries (the r10
# session found its r10 artifacts gone), and the gate's decade leg
# (GRAFT_EXP_SMALL/GRAFT_EXP_BIG) needs inputs that outlive the round —
# so every pinned artifact also lands in git-tracked tools/baselines/.
cp "$DEST" "tools/baselines/bench_idle_${TAG}.json"
python3 - "$DEST" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
spread = d.get("spread")
print(f"pinned {sys.argv[1]}: total={d['value']}s sf={d.get('sf')} "
      f"spread={spread} load_avg_start={d.get('load_avg_start')}")
if spread is not None and spread > 1.1:
    print(f"WARN: iteration spread {spread} > 1.1 — rerun on a quieter box")
    sys.exit(1)
EOF
