#!/bin/bash
# Full-suite decade campaign (r12 VERDICT #3): run the whole bench suite
# at a scaled corpus in N separate JVM slices so one long-lived driver
# cannot accumulate 60 GB of shuffle files (the r12 sf10d wall), with
# Spark's periodic driver GC reclaiming shuffle state on a clock.
#
# Usage: scripts/decade_campaign.sh <sfDir> <outTag> [nSlices] [classesDir]
#   scripts/decade_campaign.sh /tmp/sf10d sf10d 3
#
# Each slice runs from its own scratch cwd (BENCH_FULL.json lands there)
# and the script merges the slice files into /tmp/bench_<outTag>.json.
# Pass a frozen classesDir to keep the campaign pinned to one build while
# the repo is being edited/recompiled.
set -e
SFDIR="$1"; TAG="$2"; N="${3:-3}"
CLASSES="${4:-$(dirname "$0")/../target/scala-2.13/classes}"
# Resolve to an absolute path: each slice runs java after `cd` into its
# scratch dir, so a relative classesDir (including the default when the
# script is invoked by relative path) would ClassNotFound every slice.
CLASSES=$(cd "$CLASSES" && pwd)
CP="$CLASSES:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
MEM="${JRUN_MEM:-80g}"
ROOT=/tmp/bench_campaign_$TAG
rm -rf "$ROOT"; mkdir -p "$ROOT"
for i in $(seq 0 $((N-1))); do
  D="$ROOT/slice$i"; mkdir -p "$D"; cd "$D"
  echo "=== slice $i/$N start $(date -u +%H:%M:%S) ==="
  SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_SLICE="$i/$N" SPARK_GRAFT_PERIODIC_GC=5min \
  java -Xmx"$MEM" -XX:ReservedCodeCacheSize=512m \
    --add-opens java.base/java.lang=ALL-UNNAMED \
    --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
    --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
    --add-opens java.base/java.io=ALL-UNNAMED \
    --add-opens java.base/java.net=ALL-UNNAMED \
    --add-opens java.base/java.nio=ALL-UNNAMED \
    --add-opens java.base/java.util=ALL-UNNAMED \
    --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
    --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
    --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
    --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
    --add-opens java.base/sun.security.action=ALL-UNNAMED \
    --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Bench > bench_line.txt 2> bench_err.log \
    || { echo "slice $i FAILED rc=$?"; tail -40 bench_err.log; touch FAILED; }
  echo "=== slice $i/$N done  $(date -u +%H:%M:%S) ==="
done
python3 - "$ROOT" "$N" "$SFDIR" > "/tmp/bench_${TAG}.json" <<'EOF'
import json, sys, os
root, n, sf = sys.argv[1], int(sys.argv[2]), sys.argv[3]
q, skips, oob, failed = {}, {}, {}, []
for i in range(n):
    d0 = os.path.join(root, f"slice{i}")
    p = os.path.join(d0, "BENCH_FULL.json")
    # A slice with a FAILED marker or a missing artifact must be visible
    # in the merged JSON itself — a partial campaign is not a zero-skip run.
    if os.path.exists(os.path.join(d0, "FAILED")) or not os.path.exists(p):
        failed.append(f"slice{i}")
        if not os.path.exists(p):
            continue
    d = json.load(open(p))
    q.update(d.get("queries", {}))
    skips.update(d.get("skips", {}))
    oob.update(d.get("out_of_band", {}))
print(json.dumps({"metric": "total", "value": round(sum(q.values()), 3),
                  "unit": "sec", "n_queries": len(q), "sf": sf,
                  "failed_slices": failed,
                  "out_of_band": oob, "skips": skips, "queries": q}))
EOF
if grep -q '"failed_slices": \[\]' "/tmp/bench_${TAG}.json"; then
  echo "merged -> /tmp/bench_${TAG}.json"
else
  echo "merged WITH FAILED SLICES -> /tmp/bench_${TAG}.json"; exit 1
fi
