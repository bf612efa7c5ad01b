#!/bin/bash
# Serving batch-ladder sweep: warm bench.py (driver-critical executable),
# then sweep bench_serve over batch sizes.  One TPU job at a time (they
# serialize on the single chip anyway).  Results are APPENDED as JSON lines
# to .perf/ladder.log; each command's exit status is recorded in the log.
set -u -o pipefail
cd "$(dirname "$0")/.."
mkdir -p .perf
LOG=.perf/ladder.log

run() {
  echo "=== $* $(date -u +%T)" | tee -a "$LOG"
  "$@" 2>>.perf/ladder.err | tee -a "$LOG"
  echo "rc=$?" | tee -a "$LOG"
}

run timeout 3000 python bench.py
for B in 1 2 4 8; do
  DFT_BENCH_BATCH=$B run timeout 3000 python bench_serve.py
done
DFT_BENCH_MIXED=1 run timeout 3600 python bench_serve.py
echo "=== done $(date -u +%T)" | tee -a "$LOG"
