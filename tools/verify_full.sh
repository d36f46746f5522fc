#!/usr/bin/env bash
# The one-command correctness loop: engine dump -> DuckDB value compare
# -> output-type audit. Any stage failing fails the whole run, so an
# oracle that leaks a non-contract type (HUGEINT / DECIMAL / int-width
# skew) is caught HERE, before the driver's hash compare ever sees it.
#
#   tools/verify_full.sh [sfDir] [outDir]
#
# Defaults: sfDir=/root/testdata/sf0.01, outDir=/tmp/verify_full.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="${2:-/tmp/verify_full}"
LOG="$OUT_DIR.log"

echo "== 1/5 graft.Verify ($SF_DIR -> $OUT_DIR; log $LOG)"
sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR" >"$LOG" 2>&1 || {
  tail -20 "$LOG"; echo "FAIL: Verify run died"; exit 1; }
# `|| true`: a filtered run (SPARK_GRAFT_ONLY) may cover no golden-
# bearing query; an empty grep must not kill the loop under pipefail
grep -E "verify:golden.*(MATCH|MISMATCH)" "$LOG" \
  | sed 's/^\[error\] //' | awk '{print $2, $3}' | sort | uniq -c || true
if grep -qE "verify:golden.*MISMATCH|\[verify\] .* failed|CACHE-PIN" "$LOG"; then
  grep -E "verify:golden.*MISMATCH|\[verify\] .* failed|CACHE-PIN" "$LOG" | head -40
  echo "FAIL: verify errors, golden mismatches, or cache pins"; exit 1
fi
grep -E "verify:cache.*cache-clean" "$LOG" | tail -1 || true

echo "== 2/5 tools/compare.py (DuckDB value compare)"
python3 tools/compare.py "$SF_DIR" "$OUT_DIR"

echo "== 3/5 tools/typeaudit.py (hash-safe output-type contract)"
python3 tools/typeaudit.py "$SF_DIR" "$OUT_DIR"

echo "== 4/5 tools/goldenaudit.py (committed goldens: structure + live types)"
python3 tools/goldenaudit.py golden "$OUT_DIR"

echo "== 5/5 tools/leakcheck_tracked.sh (tracked-content hygiene)"
tools/leakcheck_tracked.sh
