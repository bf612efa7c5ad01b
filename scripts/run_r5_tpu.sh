#!/bin/bash
# Round-5 TPU job chain: warm-cache jobs first (serve ladder + mixed-stream
# goodput + train baseline), cold-compile A/Bs after (donate, train batch
# sweep), profiling, and the adapter-capacity OOM probe LAST (an OOM can
# wedge the remote runtime).  Results are APPENDED as JSON lines to
# .perf/r5.log with per-command exit codes.
set -u -o pipefail
cd "$(dirname "$0")/.."
mkdir -p .perf
LOG=.perf/r5.log

run() {
  echo "=== $* $(date -u +%T)" | tee -a "$LOG"
  "$@" 2>>.perf/r5.err | tee -a "$LOG"
  echo "rc=$?" | tee -a "$LOG"
}

# --- warm: serving ladder + mixed stream ---------------------------------
run timeout 3000 python bench.py
for B in 4 8 2 1; do
  DFT_BENCH_BATCH=$B run timeout 3000 python bench_serve.py
done
DFT_BENCH_MIXED=1 run timeout 3600 python bench_serve.py

# --- train: warm baseline, then cold A/Bs --------------------------------
run timeout 3000 python bench_train.py
DFT_BENCH_DONATE=1 run timeout 3600 python bench_train.py
DFT_BENCH_CARRY_BF16=1 run timeout 3600 python bench_train.py
for B in 2 4 8; do
  DFT_BENCH_TRAIN_BATCH=$B run timeout 3600 python bench_train.py
done

# --- attribution at the r5 configuration ---------------------------------
run timeout 3600 python profile_train.py .perf/train_trace_r5

# --- adapter capacity (OOM probe) — keep last ----------------------------
run timeout 3600 python scripts/probe_adapter_capacity.py

echo "=== done $(date -u +%T)" | tee -a "$LOG"
