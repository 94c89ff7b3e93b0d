#!/bin/bash
# Round-4 TPU validation chain (int16 probe already run: falsified,
# see bench/results/INT16_FALSIFIED).  Serial — one chip.
# Usage: bash scripts/r4_tpu_chain.sh &
cd "$(dirname "$0")/.."
LOG=${SEQALIGN_CHAIN_LOG:-/tmp/r4_chain.log}
: > "$LOG"
say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

say "waiting for TPU backend..."
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

say "=== 1. CLI byte-identity on the real chip (linear + affine semi) ==="
{
  diff <(./alignSequence data/dna/dna_01.txt data/dna/dna_02.txt) \
       <(timeout 1500 ./alignSequence -g data/dna/dna_01.txt data/dna/dna_02.txt) \
    && echo LINEAR_IDENTICAL
  diff <(./alignSequence --semi-global --gap-penalty 6 --gap-extend 2 data/dna/dna_01.txt data/dna/dna_02.txt) \
       <(timeout 1500 ./alignSequence -g --semi-global --gap-penalty 6 --gap-extend 2 data/dna/dna_01.txt data/dna/dna_02.txt) \
    && echo AFFINE_SEMI_IDENTICAL
} >> "$LOG" 2>&1

say "=== 2. full reference-parity sweep (real TPU, 20000 cap) ==="
mkdir -p bench/results
SEQALIGN_SCALE_TESTS=1 SEQALIGN_SWEEP_FULL=1 \
  timeout 7200 python -m pytest tests/test_sweeps.py -q \
  > bench/results/r4_full_sweep.out 2>&1
echo "rc=$?" >> bench/results/r4_full_sweep.out
say "sweep done: $(tail -2 bench/results/r4_full_sweep.out | head -1)"

say "=== 3. rps=32 split-body wavefront geometry probe ==="
timeout 5400 python scripts/sweep_wavefront_geometry.py --deep \
  > bench/results/r4_geometry_sweep.out 2>&1
say "geometry sweep rc=$?"

say "=== 4. direct engine long-text latency ==="
timeout 3600 python scripts/bench_direct_longtext.py \
  > bench/results/r4_direct_longtext.out 2>&1
say "direct longtext rc=$?"

say "=== 5. batch-e2e grid (per-pair walker routing) ==="
{
  timeout 3600 python -m seqalign_tpu.bench.suite batch-e2e --dna --size 8192 --pairs 1 8 32 256
  timeout 1800 python -m seqalign_tpu.bench.suite batch-e2e --dna --size 512 --pairs 1024 4096
} > bench/results/r4_batch_e2e.out 2>&1
say "batch-e2e rc=$?"

say "=== 6. sequence-parallel gate constants (per-chunk strip cost) ==="
timeout 3600 python scripts/measure_seqpar_gate.py \
  > bench/results/r4_seqpar_gate.out 2>&1
say "gate constants rc=$?"

say "=== 7. cold headline bench (cache-hit check) ==="
timeout 1500 python bench.py >> "$LOG" 2>&1
say "bench rc=$?"

say "chain complete"
