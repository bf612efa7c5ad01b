#!/bin/bash
# Round-4 TPU job chain: warm bench.py (driver-critical executable), then
# sweep the serving batch ladder.  One TPU job at a time (they serialize on
# the single chip anyway).  Results appended as JSON lines to .perf/ladder.log.
set -u
mkdir -p .perf
LOG=.perf/ladder.log
: > "$LOG"

echo "=== bench.py (txt2img, warms batch-1 pipeline) $(date -u +%T)" | tee -a "$LOG"
timeout 3000 python bench.py 2>>.perf/ladder.err | tee -a "$LOG"

for B in 4 8 2; do
  echo "=== bench_serve batch=$B $(date -u +%T)" | tee -a "$LOG"
  DFT_BENCH_BATCH=$B timeout 3000 python bench_serve.py 2>>.perf/ladder.err | tee -a "$LOG"
done
echo "=== done $(date -u +%T)" | tee -a "$LOG"
