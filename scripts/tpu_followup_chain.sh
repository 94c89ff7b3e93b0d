#!/bin/bash
# Follow-up TPU validations: waits for the main validation chain
# (scripts/tpu_validation_chain.sh) to finish, then runs the probes
# that depend on its outcomes:
#   - rps=32 split-body wavefront geometry (the round-2 Mosaic crash
#     workaround; measures whether the deep geometry's predicted
#     200+ GCUPS with dirs is real),
#   - a second cold headline bench run (two witnessed cold runs per
#     round; if the int16 probe validated, this one exercises the
#     int16-first candidate chain end to end),
#   - an int16-routed batch-e2e grid when INT16_VALIDATED exists
#     (the main chain's batch-e2e step ran before the probe).
# Usage: bash scripts/tpu_followup_chain.sh &
cd "$(dirname "$0")/.."
MAINLOG=${SEQALIGN_CHAIN_LOG:-/tmp/r3_chain.log}
LOG=/tmp/r3_chain2.log
: > "$LOG"
say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

say "waiting for the main chain to complete..."
for i in $(seq 1 1200); do
  if grep -q "chain complete\|aborting chain" "$MAINLOG" 2>/dev/null; then
    break
  fi
  sleep 60
done
if ! grep -q "chain complete" "$MAINLOG" 2>/dev/null; then
  say "main chain never completed; aborting follow-up"
  exit 1
fi

say "=== 1. rps=32 split-body wavefront geometry probe ==="
timeout 5400 python scripts/sweep_wavefront_geometry.py --deep >> "$LOG" 2>&1
say "geometry sweep rc=$?"

say "=== 2. second cold headline bench run ==="
timeout 1500 python bench.py >> "$LOG" 2>&1
say "bench rc=$?"

if [ -f bench/results/INT16_VALIDATED ]; then
  say "=== 3. int16-routed batch-e2e grid (marker present) ==="
  timeout 1800 python -m seqalign_tpu.bench.suite batch-e2e --dna --size 512 --pairs 1024 4096 >> "$LOG" 2>&1
  say "int16 batch-e2e rc=$?"
fi

say "follow-up chain complete"
