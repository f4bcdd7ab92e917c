#!/bin/bash
# Round-13 task #7: the full 181-query contract has only ever run with
# -Xmx48g on a 128 GiB box, where a hidden driver-side materialization
# would be invisible. Pass A digests every query unconstrained
# (local[32], 48g) as the baseline; pass B re-runs the identical digest
# sweep with a 4 GiB driver and local-cluster[2,2,1024] executors
# (separate 1 GiB JVMs) and self-gates on errors + digest drift.
# Classpath is ENUMERATED (wildcard-through-extraClassPath hazard, see
# ClusterSmoke scaladoc); each pass gets its own java.io.tmpdir so the
# landed-index warehouse/bucketed paths cannot collide.
set -uo pipefail
cd /root/repo
OUT=/tmp/sweep_r13
rm -rf "$OUT"; mkdir -p "$OUT/tmpA" "$OUT/tmpB"

ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
COMMON="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -XX:ReservedCodeCacheSize=1g -Xss32m"

# enumerated ABSOLUTE classpath: engine classes + each distribution jar
# listed (a relative classes path vanishes inside the local-cluster
# executor JVMs, which launch from the worker's own work dir — measured:
# every closure-carrying query dies with SerializedLambda/janino errors)
CP="/root/repo/target/scala-2.13/classes"
for j in /opt/spark/jars/*.jar; do CP="$CP:$j"; done

SF=${1:-/root/testdata/sf0.1}

echo "[sweep] $(date +%H:%M:%S) pass A (baseline local[32], 48g)"
SPARK_GRAFT_MASTER='local[32]' SPARK_GRAFT_SHUFFLE=16 \
java $ADD_OPENS $COMMON -Xmx48g -Djava.io.tmpdir="$OUT/tmpA" -cp "$CP" \
  graft.ConstrainedSweep "$SF" "$OUT/baseline.json" \
  > "$OUT/passA.log" 2>&1
rcA=$?
echo "[sweep] $(date +%H:%M:%S) pass A rc=$rcA"

echo "[sweep] $(date +%H:%M:%S) pass B (constrained 4g driver, local-cluster[2,2,1024])"
SPARK_GRAFT_SHUFFLE=16 \
java $ADD_OPENS $COMMON -Xmx4g -Djava.io.tmpdir="$OUT/tmpB" \
  -Dgraft.smoke.addOpens="$ADD_OPENS" -cp "$CP" \
  graft.ConstrainedSweep "$SF" "$OUT/constrained.json" "$OUT/baseline.json" \
  > "$OUT/passB.log" 2>&1
rcB=$?
echo "[sweep] $(date +%H:%M:%S) pass B rc=$rcB"
[ $rcA -eq 0 ] && [ $rcB -eq 0 ] && echo "[sweep] GREEN" || echo "[sweep] RED"
# boolean combine, not arithmetic: rcA+rcB wraps mod 256 (128+128 -> 0)
exit $(( rcA != 0 || rcB != 0 ))
