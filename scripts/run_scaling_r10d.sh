#!/bin/bash
# Round-10 wave-8 scaling datapoints: q167 (leakage-free split — the q118
# CC chain + a broadcast join) and q168 (length-batch ledger — one window
# sort of ids+lengths). q165/q169 share q161's scored chain (datapoint
# attributed there); q166 aggregates a groups-sized table (corpus pass
# only). Frozen classes snapshot (class-swap hazard).
set -uo pipefail
cd /root/repo
OUT=/tmp/scaling_r10d
mkdir -p "$OUT"
rm -rf /tmp/scaling_classes_r10d
cp -r target/scala-2.13/classes /tmp/scaling_classes_r10d
JAVA_OPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g -XX:ReservedCodeCacheSize=1g -Xss32m"
CP="/tmp/scaling_classes_r10d:/opt/spark/jars/*"
QUERIES="q167_leakage_free_split,q168_length_batches"
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
