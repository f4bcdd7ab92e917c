#!/bin/bash
# Round-14 task #3: measure the ANN derive-formula CLAMP boundaries.
#
#   shortlist clamp (q179): clamp(ceil(n/40), 50, 4096) — binds at
#     n > 163,840. RecallCurve's projected n/40 point IS the q179 derive;
#     run it at corpora below, at, and past the boundary and watch the
#     recall trajectory once the cap freezes the shortlist fraction.
#   cells clamp (q163): clamp(ceil(n/128), 16, 16384) — binds at
#     n > 2,097,152. ClampProbe runs the two-sided IVF join with a fixed
#     8k-query sample and reports candidates/query: ~nProbe*128 while the
#     derive tracks the corpus, growing linearly once the clamp binds.
#
# Corpora are embeddings-only (gen_embeddings_corpus.py mirrors ScaleUp's
# rotation transform; nothing else is scanned). Strictly serial.
set -uo pipefail
cd /root/repo
OUT=/tmp/clamp_r14
mkdir -p "$OUT"

JAVA_OPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g -XX:ReservedCodeCacheSize=1g -Xss32m"
SNAP=/tmp/clamp_classes_r14
rm -rf "$SNAP"; mkdir -p "$SNAP"
cp -r target/scala-2.13/classes/* "$SNAP/"
CP="$SNAP:/opt/spark/jars/*"
SRC=/root/testdata/sf0.1

gen() { # factor -> /tmp/embn_<factor>
  local f="$1"
  if [ ! -d "/tmp/embn_$f" ]; then
    python3 scripts/gen_embeddings_corpus.py "$SRC" "/tmp/embn_$f" "$f"
  fi
}

echo "[clamp] $(date +%H:%M:%S) generating corpora"
for f in 60 82 100 200 400; do gen $f; done      # shortlist: 120k..800k (clamp at 164k)
for f in 500 1024 1100 2100; do gen $f; done     # cells: 1M..4.2M (clamp at 2.10M)

echo "[clamp] $(date +%H:%M:%S) shortlist (RecallCurve)"
for f in 60 82 100 200 400; do
  SPARK_GRAFT_SF_DIR="/tmp/embn_$f" \
  java $JAVA_OPTS -cp "$CP" graft.RecallCurve \
    > "$OUT/recall_f$f.log" 2>&1
  rc=$?  # capture the java exit BEFORE the tail redirect (ADVICE r14)
  tail -1 "$OUT/recall_f$f.log" > "$OUT/recall_f$f.json"
  echo "[clamp] $(date +%H:%M:%S) recall f=$f rc=$rc"
done

echo "[clamp] $(date +%H:%M:%S) cells (ClampProbe)"
for f in 500 1024 1100 2100; do
  java $JAVA_OPTS -cp "$CP" graft.ClampProbe "/tmp/embn_$f" \
    > "$OUT/cells_f$f.log" 2>&1
  rc=$?
  tail -1 "$OUT/cells_f$f.log" > "$OUT/cells_f$f.json"
  echo "[clamp] $(date +%H:%M:%S) cells f=$f rc=$rc"
done
echo "[clamp] all done"
