#!/usr/bin/env bash
# Full reference-corpus sweep in sequential chunks (one pytest process
# per chunk keeps JVM memory bounded; the 154-file suite in a single
# process accumulates Spark session state). Prints a per-chunk tail and
# a final PASS/FAIL summary line.
set -uo pipefail
cd "$(dirname "$0")/.."

CHUNKS="${CORPUS_CHUNKS:-8}"
mapfile -t IDS < <(python -m pytest tests/test_reference_cases.py \
  --collect-only -q -p no:cacheprovider 2>/dev/null | grep '::')

total=${#IDS[@]}
per=$(( (total + CHUNKS - 1) / CHUNKS ))
fail=0
for ((c = 0; c < CHUNKS; c++)); do
  chunk=("${IDS[@]:c*per:per}")
  [ ${#chunk[@]} -eq 0 ]  && continue
  echo "=== chunk $((c + 1))/$CHUNKS (${#chunk[@]} files) ==="
  python -m pytest "${chunk[@]}" -q -p no:cacheprovider 2>&1 | tail -2
  rc=${PIPESTATUS[0]}
  [ "$rc" -ne 0 ] && fail=1
done
if [ "$fail" -eq 0 ]; then echo "SWEEP: ALL $total FILES GREEN"; else echo "SWEEP: FAILURES PRESENT"; fi
exit $fail
