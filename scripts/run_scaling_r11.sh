#!/bin/bash
# Round-11 scaling datapoints: queries NEW OR CHANGED this round
# (pruned-input kernel q09, BPE segment q86b, null-safe temperature
# sample q146, the ANN recall contract q177-q179, watermark replay q180,
# and q163 as the IvfCells-guard regression check) benched at sf0.1 and
# the tagged 10x corpus (/tmp/sfx10, the r9 ScaleUp output). Entries in
# BENCH_SCALING_r11.json carry corpus BYTES and ratio_per_gb (VERDICT
# r10 #7) so sub-linearity reads off the JSON. Classes run from a frozen
# snapshot so repo recompiles can't swap files under the JVMs.
set -uo pipefail
cd /root/repo
OUT=/tmp/scaling_r11
mkdir -p "$OUT"

JAVA_OPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g -XX:ReservedCodeCacheSize=1g -Xss32m"
SNAP=/tmp/scaling_classes_r11
rm -rf "$SNAP"; mkdir -p "$SNAP"
cp -r target/scala-2.13/classes/* "$SNAP/"
CP="$SNAP:/opt/spark/jars/*"

QUERIES="q09_despike,q86b_bpe_segment,q146_temperature_sample,q163_ann_join,q177_ann_recall_ivf,q178_ann_recall_lsh,q179_ann_recall_projected,q180_watermark_replay"

run() {
  local tag="$1"; shift
  echo "[scaling] $(date +%H:%M:%S) start $tag"
  java $JAVA_OPTS -cp "$CP" "$@" > "$OUT/$tag.log" 2>&1
  echo "[scaling] $(date +%H:%M:%S) done $tag rc=$?"
}

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_ONLY="$QUERIES" SPARK_GRAFT_REPS=3 \
  SPARK_GRAFT_BENCH_OUT="$OUT/bench_sf01.json" run bench_sf01 graft.Bench
SPARK_GRAFT_SF_DIR=/tmp/sfx10 SPARK_GRAFT_ONLY="$QUERIES" SPARK_GRAFT_REPS=3 \
  SPARK_GRAFT_BENCH_OUT="$OUT/bench_sfx10.json" run bench_sfx10 graft.Bench
echo "[scaling] all done"
