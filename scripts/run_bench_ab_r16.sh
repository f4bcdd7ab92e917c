#!/bin/bash
# Round-16 OPTIMIZATION A/B: same box, alternating binaries (the r15
# protocol). A = round-15 verdict commit 7718a5b classes
# (/tmp/baseline_classes_r16), B = current target/classes snapshot.
# Three alternations, REPS=2, restricted to the queries this round's
# despike/BPE/meta-cache changes touch + the in-suite controls.
set -uo pipefail
cd /root/repo
OUT=${OUT:-bench_ab_r16}
mkdir -p "$OUT"

JAVA_OPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g -XX:ReservedCodeCacheSize=1g -Xss32m"

SNAP_B=/tmp/opt_classes_r16
rm -rf "$SNAP_B"; mkdir -p "$SNAP_B"
cp -r target/scala-2.13/classes/* "$SNAP_B/"
CP_A="/tmp/baseline_classes_r16:/opt/spark/jars/*"
CP_B="$SNAP_B:/opt/spark/jars/*"

QS=${QS:-q181_qc_chain_golden,q181b_qc_chain_full,q86_bpe_tokenize,q86b_bpe_segment,q41_token_count_bpe,q74_near_dedup_against,q75_near_dedup_indexed,q78_near_dedup_index_append,near_dedup_index_probe,ngram_lm_probe,bm25_probe,ann_ivf_probe,paragraph_store_probe,q09_despike,q82_strip_spans}

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
