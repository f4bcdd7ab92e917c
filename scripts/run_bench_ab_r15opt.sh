#!/bin/bash
# Round-15 OPTIMIZATION A/B: same box, alternating binaries, so host
# throttle windows hit both variants symmetrically (the BENCH_NOTES r12
# discipline, paired form). A = pre-optimization HEAD snapshot
# (/tmp/baseline_classes_r15), B = optimized target/classes snapshot.
# Three A/B alternations, REPS=2, restricted to the queries the round's
# SimOps/annRecallHits changes touch + the in-suite controls.
set -uo pipefail
cd /root/repo
OUT=/tmp/bench_ab_r15opt
mkdir -p "$OUT"

JAVA_OPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g -XX:ReservedCodeCacheSize=1g -Xss32m"

SNAP_B=/tmp/opt_classes_r15
rm -rf "$SNAP_B"; mkdir -p "$SNAP_B"
cp -r target/scala-2.13/classes/* "$SNAP_B/"
cp -r src/main/resources/META-INF "$SNAP_B/" 2>/dev/null || true
CP_A="/tmp/baseline_classes_r15:/opt/spark/jars/*"
CP_B="$SNAP_B:/opt/spark/jars/*"

QS="q177_ann_recall_ivf,q178_ann_recall_lsh,q179_ann_recall_projected,q129_margin_matches,q164_margin_banded,q29_ann_cosine,q59_embedding_near_dup_banded,q163_ann_join,q173_semantic_decontam,q79_semantic_pairs,q92_ann_projected,q42_ann_ivf,q30_ann_lsh"

for i in 1 2 3; do
  for v in a b; do
    cp=$([ "$v" = a ] && echo "$CP_A" || echo "$CP_B")
    echo "[ab] $(date +%H:%M:%S) start ${v}$i"
    env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_REPS=2 SPARK_GRAFT_ONLY="$QS" \
      SPARK_GRAFT_BENCH_OUT="$OUT/bench_${v}$i.json" \
      java $JAVA_OPTS -cp "$cp" graft.Bench > "$OUT/bench_${v}$i.log" 2>&1
    echo "[ab] $(date +%H:%M:%S) done ${v}$i rc=$?"
  done
done
echo "[ab] all done"
