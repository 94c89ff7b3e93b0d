#!/bin/bash
# TPU validation chain: waits for the accelerator backend to be
# reachable (it can be UNAVAILABLE for hours), then runs the queued
# real-chip validations serially (one chip — no contention):
# CLI byte-identity, the full 20000-cap parity sweep (logged to
# bench/results/), direct-engine long-text latency, and the batch-e2e
# walker grid.  Usage: bash scripts/tpu_validation_chain.sh &
cd "$(dirname "$0")/.."
LOG=${SEQALIGN_CHAIN_LOG:-/tmp/r3_chain.log}
: > "$LOG"
say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

say "waiting for TPU backend..."
# Outages can last many hours (co-tenancy); wait up to ~10h.
for i in $(seq 1 600); do
  if timeout 60 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    say "backend up after probe $i"
    break
  fi
  sleep 60
done
if ! timeout 60 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
  say "backend never came up; aborting chain"
  exit 1
fi

say "=== 1. CLI byte-identity (linear + affine semi) ==="
{
  diff <(./alignSequence data/dna/dna_01.txt data/dna/dna_02.txt) \
       <(timeout 1500 ./alignSequence -g data/dna/dna_01.txt data/dna/dna_02.txt) \
    && echo LINEAR_IDENTICAL
  diff <(./alignSequence --semi-global --gap-penalty 6 --gap-extend 2 data/dna/dna_01.txt data/dna/dna_02.txt) \
       <(timeout 1500 ./alignSequence -g --semi-global --gap-penalty 6 --gap-extend 2 data/dna/dna_01.txt data/dna/dna_02.txt) \
    && echo AFFINE_SEMI_IDENTICAL
} >> "$LOG" 2>&1

say "=== 2. full reference-parity sweep (real TPU) ==="
mkdir -p bench/results
SEQALIGN_SCALE_TESTS=1 SEQALIGN_SWEEP_FULL=1 \
  timeout 5400 python -m pytest tests/test_sweeps.py -q \
  > bench/results/r3_full_sweep.out 2>&1
echo "rc=$?" >> bench/results/r3_full_sweep.out
say "sweep done: $(tail -2 bench/results/r3_full_sweep.out | head -1)"

say "=== 3. direct engine long-text latency ==="
timeout 3600 python scripts/bench_direct_longtext.py >> "$LOG" 2>&1
say "direct longtext rc=$?"

say "=== 4. batch-e2e grid (per-pair walker routing) ==="
timeout 3600 python -m seqalign_tpu.bench.suite batch-e2e --dna --size 8192 --pairs 1 8 32 256 >> "$LOG" 2>&1
say "batch-e2e 8192 rc=$?"
timeout 1800 python -m seqalign_tpu.bench.suite batch-e2e --dna --size 512 --pairs 1024 4096 >> "$LOG" 2>&1
say "batch-e2e 512 rc=$?"

say "=== 5. int16 cell mode: real-chip parity + perf ==="
timeout 3600 python scripts/probe_int16.py >> "$LOG" 2>&1
say "int16 probe rc=$?"

say "=== 6. cold headline bench (cache-hit check) ==="
timeout 1500 python bench.py >> "$LOG" 2>&1
say "bench rc=$?"

say "chain complete"
