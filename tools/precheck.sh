#!/usr/bin/env bash
# Pre-commit oracle check: run Verify for the named queries (comma-separated,
# default = ALL registered queries) at a small SF and hash-compare against
# DuckDB exactly like the driver's gate. Usage:
#   tools/precheck.sh kmv2_jaccard_est,ts2_weekday_profile [sf_dir]
# Run this for EVERY newly-registered query BEFORE committing — both r11's
# fp2 and r12's kmv2/ts2 failures were last-day registrations that never saw
# a driver-style compare. sf0.01 is the driver's gate SF; prefer it unless
# the query is too slow there.
set -euo pipefail
cd "$(dirname "$0")/.."
QUERIES="${1:-}"
SF_DIR="${2:-/root/testdata/sf0.01}"
OUT="/tmp/precheck_$$"
sbt -batch compile >/dev/null
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
if [ -n "$QUERIES" ]; then
  java -cp "$CP" graft.Verify "$SF_DIR" "$OUT" "$QUERIES" 2>/dev/null
else
  java -cp "$CP" graft.Verify "$SF_DIR" "$OUT" 2>/dev/null
fi
python3 tools/compare.py "$SF_DIR" "$OUT"
rm -rf "$OUT"
