#!/bin/bash
# Round-4 TPU chain 3: runs after chain 2 — tile x colprof geometry
# probe on the headline kernel.
cd "$(dirname "$0")/.."
LOG=${SEQALIGN_CHAIN3_LOG:-/tmp/r4_chain3.log}
: > "$LOG"
say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

CHAIN2_LOG=${SEQALIGN_CHAIN2_LOG:-/tmp/r4_chain2.log}
say "waiting for chain2 completion..."
for i in $(seq 1 360); do
  grep -q "chain2 complete" "$CHAIN2_LOG" 2>/dev/null && break
  pgrep -f "r4_tpu_chain2.sh" >/dev/null 2>&1 || break
  sleep 60
done
say "chain2 done (or gone)"

say "=== tile x colprof headline probe ==="
timeout 5400 python scripts/probe_colprof_tiles.py \
  > bench/results/r4_colprof_tiles.out 2>&1
say "probe rc=$?"
say "chain3 complete"
