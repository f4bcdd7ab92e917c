#!/bin/bash
# Round-9 scale-adjudication pipeline: regenerate the 10x corpus with the
# tagged (provably linear ground-truth) ScaleUp, run the full bench at
# sf0.1 and 10x, and record the near-dup observed-metric counts at both
# scales via ScalingProbe. Output pieces land in /tmp/scaling_r09/ and are
# composed into BENCH_SCALING_r09.json by the caller.
set -uo pipefail
cd /root/repo
OUT=/tmp/scaling_r09
mkdir -p "$OUT"

JAVA_OPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g -XX:ReservedCodeCacheSize=1g"
# frozen snapshot of the compiled classes, so recompiles in the repo can't
# swap class files under the long-running bench JVMs
CP="/tmp/scaling_classes_r09:/opt/spark/jars/*"

run() { # main args... (logs to $OUT/<tag>.log)
  local tag="$1"; shift
  echo "[scaling] $(date +%H:%M:%S) start $tag: $*"
  java $JAVA_OPTS -cp "$CP" "$@" > "$OUT/$tag.log" 2>&1
  local rc=$?
  echo "[scaling] $(date +%H:%M:%S) done $tag rc=$rc"
  return $rc
}

if [ ! -f "$OUT/scaleup.json" ]; then
  run scaleup graft.ScaleUp /root/testdata/sf0.1 /tmp/sfx10 10 || exit 1
  grep -h '"scaleup"' "$OUT/scaleup.log" | tail -1 > "$OUT/scaleup.json"
fi

SPARK_GRAFT_PROBE_OUT="$OUT/probe_sf01.json" \
  run probe_sf01 graft.ScalingProbe /root/testdata/sf0.1 || exit 1
SPARK_GRAFT_PROBE_OUT="$OUT/probe_sfx10.json" \
  run probe_sfx10 graft.ScalingProbe /tmp/sfx10 || exit 1

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT="$OUT/bench_sf01.json" \
  run bench_sf01 graft.Bench || exit 1
SPARK_GRAFT_SF_DIR=/tmp/sfx10 SPARK_GRAFT_BENCH_OUT="$OUT/bench_sfx10.json" \
  run bench_sfx10 graft.Bench || exit 1

echo "[scaling] all done"
