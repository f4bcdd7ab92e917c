#!/bin/bash
# Round-10 scaling datapoints: the queries NEW OR CHANGED this round
# (kernel despike q09, floor-mod hopping q133/q138, the promoted
# streaming composites q142/q143, and the new q144/q145/q146) benched at
# sf0.1 and at the tagged 10x corpus (/tmp/sfx10, the r9 ScaleUp output
# with provably-linear ground truth). Classes run from a frozen snapshot
# so repo recompiles can't swap files under the JVMs.
set -uo pipefail
cd /root/repo
OUT=/tmp/scaling_r10
mkdir -p "$OUT"

JAVA_OPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g -XX:ReservedCodeCacheSize=1g -Xss32m"
CP="/tmp/scaling_classes_r10:/opt/spark/jars/*"

QUERIES="q09_despike,q133_hopping_windows,q138_rate_spikes,q142_rate_spikes_landed,q143_stream_ingest_replay,q144_hybrid_rrf,q145_corpus_containment,q146_temperature_sample"

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
