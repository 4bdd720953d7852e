#!/usr/bin/env bash
# Execution-environment invariance matrix: the full oracle sweep re-run
# under execution configs that must NOT change any answer. A cluster
# resize (shuffle-partition count), an AQE toggle, or codegen falling
# back to interpreted expression eval are all things that happen to a
# real 100 TB job mid-flight; a query whose result moves under any of
# them is nondeterministic at scale even if the fixed-config sweep is
# green. Sweep 3 (NO_CODEGEN) is also the only path that exercises every
# custom Catalyst Expression's eval() against the oracle — doGenCode()
# and eval() drifting apart is the classic custom-expression bug class,
# invisible while codegen always wins.
#
# Usage: tools/invariance.sh [sfDir] (default /root/testdata/sf0.01)
# ~75-90 min total (13 rows). Each sweep: graft.Verify dump + compare.py.
set -u
SF=${1:-/root/testdata/sf0.01}
fail=0
run() { # name conf [extra VAR=val env pairs...]
  local name=$1 conf=$2 out="/tmp/inv_$1"; shift 2
  echo "== $name: SPARK_GRAFT_EXTRA_CONF=$conf $*"
  env "$@" SPARK_GRAFT_EXTRA_CONF="$conf" sbt -batch \
    "runMain graft.Verify $SF $out" >"/tmp/inv_$name.log" 2>&1 \
    || { echo "  VERIFY FAILED (see /tmp/inv_$name.log)"; fail=1; return; }
  python3 tools/compare.py "$out" "$SF" | tail -1
  python3 tools/compare.py "$out" "$SF" >/dev/null 2>&1 || fail=1
}
run part7  "spark.sql.shuffle.partitions=7"
run noaqe  "spark.sql.adaptive.enabled=false"
run interp "spark.sql.codegen.wholeStage=false;spark.sql.codegen.factoryMode=NO_CODEGEN"
# (d)/(e): the custom TypedImperativeAggregates (graft_topk & friends)
# normally run inside ObjectHashAggregate's hash map; (d) forces the
# sort-based fallback at ONE distinct group (the memory-pressure path —
# per-group serialize/merge on sorted runs), (e) removes
# ObjectHashAggregate entirely (SortAggregate). Both are what a real
# executor under memory pressure does to these aggregates at 100 TB.
run aggfb  "spark.sql.objectHashAggregate.sortBased.fallbackThreshold=1"
run sortagg "spark.sql.execution.useObjectHashAggregateExec=false"
# (f): session-timezone independence, at the nastiest fixed offset
# (+05:45). Batch is wall-clock-closed (NTZ→LTZ→NTZ round-trips the
# stored wall); streaming derives INSTANTS (unix_micros, window
# boundaries, watermark state) and is pinned to UTC event-time
# semantics via streaming/EventTime — this row is what caught the
# original 7-query drift (COVERAGE.md r8).
run tz     "spark.sql.session.timeZone=Asia/Kathmandu"
# (g)/(h): storage/memory execution paths. The vectorized parquet
# reader silently bails to the row-based reader on schema corner cases
# (nested types, some decimals) — row (g) runs the WHOLE catalog on the
# row-based path. Row (h) puts Tungsten buffers off-heap (how large
# executors actually run), a different UnsafeRow memory path.
run rowread "spark.sql.parquet.enableVectorizedReader=false"
run offheap "spark.memory.offHeap.enabled=true;spark.memory.offHeap.size=1g"
# (i)/(j)/(k): operational execution paths a 100 TB cluster actually
# runs. Row (i) turns on aggressive SPECULATION — duplicate task clones
# racing the originals (multiplier 1 + quantile 0.05 speculates almost
# every task); answers and committed parquet output must be identical,
# i.e. no operator depends on tasks running exactly once. Row (j)
# FORCES EXTERNAL SPILL: every UnsafeExternalSorter consumer spills to
# disk every 5000 rows and the window/SMJ row buffers spill at 1000 —
# the memory-pressure merge paths (spill-file merge order, buffer
# round-trip through disk) that never engage at toy scale. Row (k)
# swaps the JVM serializer for KRYO — the standard production setting;
# exercises closure/broadcast/cache serialization of every operator's
# helper structures.
run spec  "spark.speculation=true;spark.speculation.interval=50ms;spark.speculation.quantile=0.05;spark.speculation.multiplier=1.0;spark.speculation.minTaskRuntime=0ms"
run spill "spark.shuffle.spill.numElementsForceSpillThreshold=5000;spark.sql.windowExec.buffer.spill.threshold=1000;spark.sql.sortMergeJoinExec.buffer.spill.threshold=1000"
run kryo  "spark.serializer=org.apache.spark.serializer.KryoSerializer"
# (l)/(m): TASK-LEVEL FAULT TOLERANCE. Row (l) is the chaos monkey —
# Verify's ChaosKillListener kills the first attempt of every third
# task mid-flight (interruptThread=true); kills don't count toward
# maxFailures, the scheduler reschedules, and every answer + committed
# parquet must hash-match (Verify aborts if zero kills landed, so the
# row can't pass vacuously). This is preemption/decommission/lost-
# speculation-race as it happens on a real cluster, and it reaches the
# streaming twins too. Row (m) injects hard FAILURES instead: the
# conf-gated FaultInjectExec (plans/FaultInject.scala) throws on the
# first attempt of every third partition above every parquet scan, on
# a local[4,4] master so retries are allowed — the ExceptionFailure /
# maxFailures-accounting retry path, including retried source tasks
# feeding shuffles and the coalesce(1) write jobs.
run chaoskill "spark.graft.chaosRow=1" SPARK_GRAFT_CHAOS=kill
run taskretry "spark.graft.faultInject=true" SPARK_GRAFT_MASTER=local[4,4]
exit $fail
