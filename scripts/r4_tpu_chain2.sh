#!/bin/bash
# Round-4 TPU chain 2: colprof A/B on the headline, re-runs of the two
# chain-1 steps that found bugs (batch-e2e walker, gate constants).
# Usage: bash scripts/r4_tpu_chain2.sh &
cd "$(dirname "$0")/.."
LOG=${SEQALIGN_CHAIN2_LOG:-/tmp/r4_chain2.log}
: > "$LOG"
say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

say "waiting for TPU backend..."
for i in $(seq 1 240); do
  if timeout 60 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    say "backend up after probe $i"; break
  fi
  sleep 60
done

say "=== 1. headline bench, colprof ON (new trace; watchdog absorbs the cold compile) ==="
timeout 1700 python bench.py > bench/results/r4_bench_colprof_on.out 2>&1
say "colprof ON rc=$? $(tail -1 bench/results/r4_bench_colprof_on.out)"

say "=== 2. headline bench, colprof OFF (select-chain baseline, warm cache) ==="
SEQALIGN_DNA_COLPROF=0 timeout 1700 python bench.py \
  > bench/results/r4_bench_colprof_off.out 2>&1
say "colprof OFF rc=$? $(tail -1 bench/results/r4_bench_colprof_off.out)"

say "=== 3. on-chip parity: batched align (fill+walker) vs oracle, colprof ON ==="
timeout 2400 python - > bench/results/r4_colprof_chip_parity.out 2>&1 <<'EOF'
import numpy as np
from seqalign_tpu import config
config.enable_compile_cache()
from seqalign_tpu.parallel.batch import BatchAligner
from seqalign_tpu.native import bindings
rng = np.random.default_rng(31)
sm = np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)
texts = [rng.integers(0,4,int(rng.integers(100,400))).astype(np.int32) for _ in range(64)]
pats  = [rng.integers(0,4,int(rng.integers(80,380))).astype(np.int32) for _ in range(64)]
for mode in ({}, {"local": True}, {"semi": True}, {"gap_extend": 2},
             {"local": True, "gap_extend": 2}):
    res = BatchAligner(sm, 4, 5, **mode).align(texts, pats)
    algo = 1 if mode.get("local") else (2 if mode.get("semi") else 0)
    for i in (0, 17, 63):
        t, p = texts[i], pats[i]
        if mode.get("gap_extend"):
            at, ap, st, sp, osc = bindings.oracle_align_affine(
                algo, t.astype(np.int8), p.astype(np.int8), sm, 4, 5, 2)
        else:
            at, ap, st, sp, osc = bindings.oracle_align(
                algo, t.astype(np.int8), p.astype(np.int8), sm, 4, 5)
        r = res[i]
        assert r.score == osc, (mode, i, r.score, osc)
        assert np.array_equal(r.aligned_text, at), (mode, i)
        assert np.array_equal(r.aligned_pattern, ap), (mode, i)
    print("chip parity OK", mode, flush=True)
print("ALL ON-CHIP COLPROF ALIGN PARITY OK")
EOF
say "chip parity rc=$?"

say "=== 4. batch-e2e grid rerun (per-pair walker fixed) ==="
{
  timeout 5400 python -m seqalign_tpu.bench.suite batch-e2e --dna --size 8192 --pairs 1 8 32 256
  timeout 1800 python -m seqalign_tpu.bench.suite batch-e2e --dna --size 512 --pairs 1024 4096
} > bench/results/r4_batch_e2e.out 2>&1
say "batch-e2e rc=$?"

say "=== 5. sequence-parallel gate constants (fixed ckpt_cols) ==="
timeout 3600 python scripts/measure_seqpar_gate.py \
  > bench/results/r4_seqpar_gate.out 2>&1
say "gate constants rc=$?"

say "chain2 complete"
