#!/bin/bash
# Round-12 task #3: adjudicate the r10->r11 local-bench drift.
# Same binary (the r12 snapshot), same box, back-to-back:
#   A = r11 protocol (reps=5, forced GC between passes)
#   B = r10 protocol (reps=3, no forced GC)
# If A ~= B per query, the drift was NOT the protocol -> compare against
# BENCH_LOCAL_r10 for real regressions. If A >> B, the reps+GC protocol
# change explains the r11 inflation. Classes run from a frozen snapshot
# so repo recompiles can't swap files under the JVMs; runs are strictly
# sequential (one Bench JVM at a time - the steady landed-index rule).
set -uo pipefail
cd /root/repo
OUT=/tmp/bench_ab_r12
mkdir -p "$OUT"

JAVA_OPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g -XX:ReservedCodeCacheSize=1g -Xss32m"
SNAP=/tmp/bench_ab_classes_r12
rm -rf "$SNAP"; mkdir -p "$SNAP"
cp -r target/scala-2.13/classes/* "$SNAP/"
CP="$SNAP:/opt/spark/jars/*"

run() {
  local tag="$1"; shift
  echo "[bench-ab] $(date +%H:%M:%S) start $tag"
  "$@" java $JAVA_OPTS -cp "$CP" graft.Bench > "$OUT/$tag.log" 2>&1
  echo "[bench-ab] $(date +%H:%M:%S) done $tag rc=$?"
}

run a_reps5_gc   env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_REPS=5 SPARK_GRAFT_GC=1 \
  SPARK_GRAFT_BENCH_OUT="$OUT/bench_a_reps5_gc.json"
run b_reps3_nogc env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_REPS=3 SPARK_GRAFT_GC=0 \
  SPARK_GRAFT_BENCH_OUT="$OUT/bench_b_reps3_nogc.json"
echo "[bench-ab] all done"
