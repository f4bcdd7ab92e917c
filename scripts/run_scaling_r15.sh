#!/bin/bash
# Round-15 scaling campaign (VERDICT r14 #4 + #5):
#  - the skew-adversarial decade suite at 1x/10x/100x of sf0.1, with the
#    SESSIONIZE ENTRY NOW THE BUCKETED OPERATOR at every factor and an
#    EMPTY stage-skew exemption list (r14 measured plain sessionize's
#    documented inherent hot spot at 3.3-3.8x and shipped
#    sessionizeBucketed, bit-identical by SessionizeParitySpec/q182 — the
#    production operator is the one the record gates);
#  - a THIRD DECADE (1000x) for the three steepest skew families
#    (ivf_join 9.7x, near_dup 6.0x, semantic 5.5x per unit at 100x/10x in
#    r14) — documents/embeddings scale x1000, the untouched fact tables
#    pass through at 1x (ScaleUp only=), REPS=1, scan-audit gate on;
#  - a RecallCurve run on sf0.1 recording the r15 trained-codebook IVF
#    operating points next to the LSH/projected curves.
# Classes run from a frozen snapshot; runs strictly sequential.
set -uo pipefail
cd /root/repo
OUT=/tmp/scaling_r15
mkdir -p "$OUT"

JAVA_OPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g -XX:ReservedCodeCacheSize=1g -Xss32m"
SNAP=/tmp/scaling_classes_r15
rm -rf "$SNAP"; mkdir -p "$SNAP"
cp -r target/scala-2.13/classes/* "$SNAP/"
CP="$SNAP:/opt/spark/jars/*"

SKEWQ="skew_near_dup_capped,skew_ivf_join_capped,skew_semantic_capped,skew_sessionize_bucketed,skew_plain_join_hotuser,skew_salted_join,skew_fact_join,skew_exact_dedup,skew_paragraph_dedup"
DEEPQ="skew_near_dup_capped,skew_ivf_join_capped,skew_semantic_capped"

run() {
  local tag="$1"; local klass="$2"; shift 2
  echo "[scaling] $(date +%H:%M:%S) start $tag"
  "$@" java $JAVA_OPTS -cp "$CP" "$klass" > "$OUT/$tag.log" 2>&1
  rc=$?
  echo "[scaling] $(date +%H:%M:%S) done $tag rc=$rc"
}

# skew corpora (delete first: stale corpora under the same path poisoned
# a prior round's measurements)
rm -rf /tmp/sfs1 /tmp/sfs10 /tmp/sfs100 /tmp/sfs1000
java $JAVA_OPTS -cp "$CP" graft.ScaleUp /root/testdata/sf0.1 /tmp/sfs1 1 skew > "$OUT/scaleup_sfs1.log" 2>&1
echo "[scaling] $(date +%H:%M:%S) sfs1 rc=$?"
java $JAVA_OPTS -cp "$CP" graft.ScaleUp /root/testdata/sf0.1 /tmp/sfs10 10 skew > "$OUT/scaleup_sfs10.log" 2>&1
echo "[scaling] $(date +%H:%M:%S) sfs10 rc=$?"
java $JAVA_OPTS -cp "$CP" graft.ScaleUp /root/testdata/sf0.1 /tmp/sfs100 100 skew > "$OUT/scaleup_sfs100.log" 2>&1
echo "[scaling] $(date +%H:%M:%S) sfs100 rc=$?"
java $JAVA_OPTS -cp "$CP" graft.ScaleUp /root/testdata/sf0.1 /tmp/sfs1000 1000 skew only=documents,embeddings > "$OUT/scaleup_sfs1000.log" 2>&1
echo "[scaling] $(date +%H:%M:%S) sfs1000 rc=$?"

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

# third decade: the three steepest families at 1000x (REPS=1 — each leg
# is minutes; the datapoint is the decade ratio, not a median)
run bench_sfs1000_c graft.Bench env SPARK_GRAFT_SKEW=1 \
  SPARK_GRAFT_TASKSTATS=1 SPARK_GRAFT_ONLY=$DEEPQ \
  SPARK_GRAFT_SCAN_AUDIT=fail SPARK_GRAFT_SF_DIR=/tmp/sfs1000 \
  SPARK_GRAFT_REPS=1 SPARK_GRAFT_BENCH_OUT="$OUT/bench_sfs1000_c.json"

# trained-codebook recall curve (sf0.1): the r15 IVF operating points
run recall_curve_sf01 graft.RecallCurve env \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1

echo "[scaling] all done"
