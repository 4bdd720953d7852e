#!/usr/bin/env bash
# Combined hostile-DATA x hostile-EXECUTION rows (r9 judge ask #3): the
# extended adversarial fixture (tools/gen_adversarial.py — relational
# TPC-H tables included since r9) re-swept under the highest-yield
# execution-invariance configs from tools/invariance.sh. r8 ran these
# combo rows for the documents/events batches only; this closes the
# matrix for the relational extension. Config choice (3 of 13, by
# historical divergence yield):
#   interp    — codegen off: every custom Expression's eval() path vs
#               the oracle ON hostile values (doGenCode/eval drift class)
#   spill     — forced external-sorter / window / SMJ buffer spill: the
#               memory-pressure merge paths over hostile keys (NULL-first
#               orderings, duplicate PKs, 40k-char rows)
#   chaoskill — first attempt of every third task killed mid-flight:
#               exactly-once answers under retry while reading the
#               hostile fixture (non-deterministic kill points x
#               adversarial partitions)
#
# Runs the compiled classes directly (no sbt — safe next to a live
# background run; gate.sh stage 8 passes the repo's own class dir after
# its compile stage). Usage:
#   tools/combo_rows.sh [classDir] [cpus]   (default target/scala-2.13/classes, 12)
set -u
CLASSES=${1:-target/scala-2.13/classes}
CPUS=${2:-12}
ADV=/tmp/sfadv
fail=0

# Spark 4.x on JDK 17 outside spark-submit/sbt needs the module opens
# (build.sbt's jdk17AddOpens — without them MLlib's auto-Kryo shuffle
# path dies on java.nio.HeapByteBuffer registration, caught r10 by this
# very script's first run: q73's KMeans countByValue).
JOPTS=$(printf -- '--add-opens=java.base/%s=ALL-UNNAMED ' \
  java.lang java.lang.invoke java.lang.reflect java.io java.net \
  java.nio java.util java.util.concurrent java.util.concurrent.atomic \
  sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar)

python3 tools/gen_adversarial.py /root/testdata/sf0.001 "$ADV" \
  || { echo "fixture generation FAILED"; exit 1; }

run() { # name [env pairs...]
  local name=$1 out="/tmp/combo_$1"; shift
  echo "== combo $name =="
  rm -rf "$out"
  env "$@" SPARK_GRAFT_CPUS="$CPUS" \
    java $JOPTS -Xmx12g -cp "$CLASSES:/opt/spark/jars/*" \
    graft.Verify "$ADV" "$out" >"/tmp/combo_$name.log" 2>&1 \
    || { echo "  VERIFY FAILED (see /tmp/combo_$name.log)"; fail=1; return; }
  python3 tools/compare.py "$out" "$ADV" | tail -1
  python3 tools/compare.py "$out" "$ADV" 2>/dev/null | tail -1 | grep -q " 0 fail" || fail=1
}

run interp SPARK_GRAFT_EXTRA_CONF="spark.sql.codegen.wholeStage=false;spark.sql.codegen.factoryMode=NO_CODEGEN"
run spill  SPARK_GRAFT_EXTRA_CONF="spark.shuffle.spill.numElementsForceSpillThreshold=5000;spark.sql.windowExec.buffer.spill.threshold=1000;spark.sql.sortMergeJoinExec.buffer.spill.threshold=1000"
run chaoskill SPARK_GRAFT_EXTRA_CONF="spark.graft.chaosRow=1" SPARK_GRAFT_CHAOS=kill

echo "combo rows done, fail=$fail"
exit $fail
