#!/bin/bash
# Usage: scripts/check_subset.sh <comma-names> [sfdir ...]
# Runs graft.Verify for the named queries at each SF dir and replays the
# DuckDB oracle compare for just those names.
set -e
NAMES="$1"; shift
DIRS="${@:-/root/testdata/sf0.001 /root/testdata/sf0.01 /root/testdata/sf0.1}"
for SF in $DIRS; do
  OUT=/tmp/subset_out_$(basename $SF)
  rm -rf $OUT
  sbt -batch "runMain graft.Verify $SF $OUT $NAMES" >/tmp/subset_verify.log 2>&1 \
    || { tail -20 /tmp/subset_verify.log; exit 1; }
  python3 - "$NAMES" $OUT <<'EOF'
import json, sys
names = set(sys.argv[1].split(","))
out = sys.argv[2]
o = json.load(open(f"{out}/oracle_sql.json"))
json.dump({k: v for k, v in o.items() if k in names}, open(f"{out}/oracle_sql.json", "w"))
EOF
  echo "== $SF =="
  python3 scripts/check.py $SF $OUT
done
