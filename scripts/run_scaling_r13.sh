#!/bin/bash
# Round-13 task #3: the 100x DECADE check on the derived-parameter queries.
# Both prior derivation bugs (q163 IVF cells at 137x, q179 shortlist at 18%
# recall) were caught only by the 10x rerun — one decade. This runs the six
# candidate-bounded queries (q25, q79, q80, q163, q178, q179, plus q177 for
# the IVF floor) at sf0.1, the 10x corpus, and a NEW 100x ScaleUp corpus
# (/tmp/sfx100, tag-disjoint copies: ground-truth candidates scale exactly
# linearly, so a super-linear wall curve is the engine's), then the recall
# curve at 100x for the pinned floors. The in-Bench control slice
# (ctrl_agg/join/window) rides every run, so the box-speed normalizer is in
# each JSON. Classes run from a frozen snapshot; runs strictly sequential.
set -uo pipefail
cd /root/repo
OUT=/tmp/scaling_r13
mkdir -p "$OUT"

JAVA_OPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g -XX:ReservedCodeCacheSize=1g -Xss32m"
SNAP=/tmp/scaling_classes_r13
rm -rf "$SNAP"; mkdir -p "$SNAP"
cp -r target/scala-2.13/classes/* "$SNAP/"
CP="$SNAP:/opt/spark/jars/*"

QUERIES="q25_near_dup_pairs,q79_semantic_pairs,q80_semantic_dedup,q163_ann_join,q177_ann_recall_ivf,q178_ann_recall_lsh,q179_ann_recall_projected"

run() {
  local tag="$1"; local klass="$2"; shift 2
  echo "[scaling] $(date +%H:%M:%S) start $tag"
  "$@" java $JAVA_OPTS -cp "$CP" "$klass" > "$OUT/$tag.log" 2>&1
  echo "[scaling] $(date +%H:%M:%S) done $tag rc=$?"
}

run bench_sf01 graft.Bench env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_ONLY="$QUERIES" SPARK_GRAFT_REPS=3 \
  SPARK_GRAFT_BENCH_OUT="$OUT/bench_sf01.json"
run bench_sfx10 graft.Bench env SPARK_GRAFT_SF_DIR=/tmp/sfx10 \
  SPARK_GRAFT_ONLY="$QUERIES" SPARK_GRAFT_REPS=3 \
  SPARK_GRAFT_BENCH_OUT="$OUT/bench_sfx10.json"
run bench_sfx100 graft.Bench env SPARK_GRAFT_SF_DIR=/tmp/sfx100 \
  SPARK_GRAFT_ONLY="$QUERIES" SPARK_GRAFT_REPS=2 \
  SPARK_GRAFT_BENCH_OUT="$OUT/bench_sfx100.json"
run recall_x100 graft.RecallCurve env SPARK_GRAFT_SF_DIR=/tmp/sfx100
echo "[scaling] all done"
