#!/usr/bin/env bash
# Three-SF correctness sweep: runs graft.Verify + scripts/check.py at every
# fixture scale factor. One command reproducing the README claim that all
# oracled queries pass at sf0.001 / sf0.01 / sf0.1.
#
# Usage: scripts/check_all.sh [query1,query2,...]   (default: all queries)
set -uo pipefail
cd "$(dirname "$0")/.."
SUBSET="${1:-}"
FAILED=0
for sf in sf0.001 sf0.01 sf0.1; do
  out="/tmp/graft_verify_${sf}"
  rm -rf "$out"
  echo "=== Verify $sf ==="
  sbt -batch "runMain graft.Verify /root/testdata/$sf $out $SUBSET" \
    > "/tmp/graft_verify_${sf}.log" 2>&1 || {
      echo "VERIFY FAILED at $sf — tail of log:"; tail -30 "/tmp/graft_verify_${sf}.log";
      FAILED=1; continue; }
  python3 scripts/check.py --strict "/root/testdata/$sf" "$out" | tail -5
  rc=${PIPESTATUS[0]}
  [ "$rc" -ne 0 ] && FAILED=1
done
if [ "$FAILED" -ne 0 ]; then echo "SWEEP: FAIL"; exit 1; fi
echo "SWEEP: all three scale factors clean"
