#!/bin/bash
# Round-10 wave-4 scaling datapoints: q161-q164 (DSIR, ANN join, banded margin).
# BENCH_SCALING_r10 (q147-q150) plus the new q154-q156, benched at sf0.1
# and the tagged 10x corpus. Frozen classes snapshot (class-swap hazard).
set -uo pipefail
cd /root/repo
OUT=/tmp/scaling_r10c
mkdir -p "$OUT"
JAVA_OPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g -XX:ReservedCodeCacheSize=1g -Xss32m"
CP="/tmp/scaling_classes_r10c:/opt/spark/jars/*"
QUERIES="q161_dsir_scores,q162_dsir_resample,q163_ann_join,q164_margin_banded"
run() {
  local tag="$1"; shift
  echo "[scaling] $(date +%H:%M:%S) start $tag"
  java $JAVA_OPTS -cp "$CP" "$@" > "$OUT/$tag.log" 2>&1
  local rc=$?
  echo "[scaling] $(date +%H:%M:%S) done $tag rc=$rc"
}
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_ONLY="$QUERIES" SPARK_GRAFT_REPS=3 \
  SPARK_GRAFT_BENCH_OUT="$OUT/bench_sf01.json" run bench_sf01 graft.Bench
SPARK_GRAFT_SF_DIR=/tmp/sfx10 SPARK_GRAFT_ONLY="$QUERIES" SPARK_GRAFT_REPS=3 \
  SPARK_GRAFT_BENCH_OUT="$OUT/bench_sfx10.json" run bench_sfx10 graft.Bench
echo "[scaling] all done"
