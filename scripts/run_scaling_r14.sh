#!/bin/bash
# Round-14 task #1: the SKEW-ADVERSARIAL decade check. The r13 decade
# corpora were tag-disjoint UNIFORM copies — no hot key scaled, so the
# engine's skew defenses (maxBucket, maxCell, saltedJoin, AQE skew-join)
# had never been exercised at scale. This builds skewed ScaleUp corpora
# (1% boilerplate docs, a hub embedding region above the centroid
# prefix, a ~10%-of-events bot user over a Zipf user domain, a hot
# lineitem order key) at 1x/10x/100x of sf0.1 and runs the 9-entry skew
# suite with per-query TASK stats (max/med task seconds — the skew
# signal) and the in-session control slice. The scan-layout gate
# (SPARK_GRAFT_SCAN_AUDIT=fail, VERDICT r13 #7) rides the scaled runs so
# a single-file-layout regression fails loudly instead of serializing a
# map side silently; the 1x corpus is single-file by construction
# (factor=1), so it runs with the audit in advise mode.
# Classes run from a frozen snapshot; runs strictly sequential.
set -uo pipefail
cd /root/repo
OUT=/tmp/scaling_r14
mkdir -p "$OUT"

JAVA_OPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g -XX:ReservedCodeCacheSize=1g -Xss32m"
SNAP=/tmp/scaling_classes_r14
rm -rf "$SNAP"; mkdir -p "$SNAP"
cp -r target/scala-2.13/classes/* "$SNAP/"
CP="$SNAP:/opt/spark/jars/*"

SKEWQ="skew_near_dup_capped,skew_ivf_join_capped,skew_semantic_capped,skew_sessionize,skew_sessionize_bucketed,skew_plain_join_hotuser,skew_salted_join,skew_fact_join,skew_exact_dedup,skew_paragraph_dedup"

run() {
  local tag="$1"; local klass="$2"; shift 2
  echo "[scaling] $(date +%H:%M:%S) start $tag"
  "$@" java $JAVA_OPTS -cp "$CP" "$klass" > "$OUT/$tag.log" 2>&1
  echo "[scaling] $(date +%H:%M:%S) done $tag rc=$?"
}

# skew corpora (delete first: stale uniform corpora under the same
# path poisoned a prior round's measurements)
rm -rf /tmp/sfs1 /tmp/sfs10 /tmp/sfs100
java $JAVA_OPTS -cp "$CP" graft.ScaleUp /root/testdata/sf0.1 /tmp/sfs1 1 skew > "$OUT/scaleup_sfs1.log" 2>&1
echo "[scaling] $(date +%H:%M:%S) sfs1 rc=$?"
java $JAVA_OPTS -cp "$CP" graft.ScaleUp /root/testdata/sf0.1 /tmp/sfs10 10 skew > "$OUT/scaleup_sfs10.log" 2>&1
echo "[scaling] $(date +%H:%M:%S) sfs10 rc=$?"
java $JAVA_OPTS -cp "$CP" graft.ScaleUp /root/testdata/sf0.1 /tmp/sfs100 100 skew > "$OUT/scaleup_sfs100.log" 2>&1
echo "[scaling] $(date +%H:%M:%S) sfs100 rc=$?"

COMMON_ENV="SPARK_GRAFT_SKEW=1 SPARK_GRAFT_TASKSTATS=1 SPARK_GRAFT_ONLY=$SKEWQ"

run bench_sfs1_c graft.Bench env $COMMON_ENV SPARK_GRAFT_SCAN_AUDIT=1 \
  SPARK_GRAFT_SF_DIR=/tmp/sfs1 SPARK_GRAFT_REPS=3 \
  SPARK_GRAFT_BENCH_OUT="$OUT/bench_sfs1_c.json"
run bench_sfs10_c graft.Bench env $COMMON_ENV SPARK_GRAFT_SCAN_AUDIT=fail \
  SPARK_GRAFT_SF_DIR=/tmp/sfs10 SPARK_GRAFT_REPS=3 \
  SPARK_GRAFT_BENCH_OUT="$OUT/bench_sfs10_c.json"
run bench_sfs100_c graft.Bench env $COMMON_ENV SPARK_GRAFT_SCAN_AUDIT=fail \
  SPARK_GRAFT_SF_DIR=/tmp/sfs100 SPARK_GRAFT_REPS=2 \
  SPARK_GRAFT_BENCH_OUT="$OUT/bench_sfs100_c.json"
echo "[scaling] all done"
