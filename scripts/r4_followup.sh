#!/bin/bash
# Round-4 follow-up: runs after scripts/r4_tpu_chain.sh completes.
# 1. the 64k-pair batch-e2e north-star workload on the real chip ->
#    bench/results/BATCH_E2E_r04.json (trendable per-round artifact)
# 2. the full default test suite on the virtual CPU mesh (deferred
#    until the chain releases the single host core).
cd "$(dirname "$0")/.."
LOG=${SEQALIGN_FOLLOWUP_LOG:-/tmp/r4_followup.log}
: > "$LOG"
say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

CHAIN_LOG=${SEQALIGN_CHAIN_LOG:-/tmp/r4_chain.log}
say "waiting for chain completion in $CHAIN_LOG..."
for i in $(seq 1 720); do
  grep -q "chain complete" "$CHAIN_LOG" 2>/dev/null && break
  pgrep -f "r4_tpu_chain.sh" >/dev/null 2>&1 || break
  sleep 60
done
say "chain done (or gone); starting follow-up"

say "=== A. 64k-pair DNA batch end-to-end metric (real chip) ==="
timeout 3600 python scripts/bench_batch_e2e_metric.py \
  --out bench/results/BATCH_E2E_r04.json \
  > bench/results/r4_batch_e2e_metric.out 2>&1
say "batch-e2e metric rc=$?"

say "=== B. full default test suite (virtual CPU mesh) ==="
timeout 3600 python -m pytest tests/ -q > /tmp/r4_pytest.log 2>&1
say "pytest rc=$? tail: $(tail -1 /tmp/r4_pytest.log)"

say "followup complete"
