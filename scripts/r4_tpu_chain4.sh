#!/bin/bash
# Round-4 TPU chain 4: validate the tile8192 headline through the
# watchdog, re-run everything the shard_map-caching fix should speed up,
# re-check the phantom step-3 crash, and probe the next geometry rungs.
cd "$(dirname "$0")/.."
LOG=${SEQALIGN_CHAIN4_LOG:-/tmp/r4_chain4.log}
: > "$LOG"
say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

say "waiting for TPU backend..."
for i in $(seq 1 240); do
  if timeout 60 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    say "backend up after probe $i"; break
  fi
  sleep 60
done

say "=== 1. headline bench via watchdog (tile8192 first) ==="
timeout 1700 python bench.py > bench/results/r4_bench_tile8192.out 2>&1
say "bench rc=$? $(tail -1 bench/results/r4_bench_tile8192.out)"

say "=== 2. on-chip batched align parity rerun (was: phantom worker crash) ==="
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
say "parity rc=$?"

say "=== 3. 64k batch-e2e metric rerun (shard_map caching fix) ==="
timeout 3600 python scripts/bench_batch_e2e_metric.py \
  --out bench/results/BATCH_E2E_r04.json \
  > bench/results/r4_batch_e2e_metric.out 2>&1
say "metric rc=$? $(tail -1 bench/results/BATCH_E2E_r04.json 2>/dev/null)"

say "=== 4. gate constants rerun (caching fix: measures real per-chunk cost) ==="
timeout 3600 python scripts/measure_seqpar_gate.py \
  > bench/results/r4_seqpar_gate.out 2>&1
say "gate rc=$?"

say "=== 5. batch-e2e grid rerun ==="
{
  timeout 3600 python -m seqalign_tpu.bench.suite batch-e2e --dna --size 8192 --pairs 1 8 32 256
  timeout 1800 python -m seqalign_tpu.bench.suite batch-e2e --dna --size 512 --pairs 1024 4096
} > bench/results/r4_batch_e2e.out 2>&1
say "batch-e2e rc=$?"

say "=== 6. next geometry rungs: tile16384 score, dirs-kernel tiles ==="
timeout 3600 python - > bench/results/r4_tile_next.out 2>&1 <<'EOF'
import numpy as np, sys
from seqalign_tpu import config as sa_config
sa_config.enable_compile_cache()
import jax, jax.numpy as jnp
from seqalign_tpu.bench.timing import device_seconds_per_call
from seqalign_tpu.ops.pallas_fill import batch_score_pallas, batch_fill_dirs_pallas
rng = np.random.default_rng(42)
b, n, m = 16384, 512, 512
sm = jnp.asarray(np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32))
texts = jnp.asarray(rng.integers(0, 4, (b, n)), jnp.int32)
patterns = jnp.asarray(rng.integers(0, 4, (b, m)), jnp.int32)
ns = jnp.full((b,), n, jnp.int32); ms = jnp.full((b,), m, jnp.int32)
cells = b * n * m
for tile in (8192, 16384):
    def call(perturb, tile=tile):
        return batch_score_pallas(texts, patterns, ns, ms, sm, 5 + perturb,
                                  k_alpha=4, local=True, tile_pairs=tile)
    try:
        sec = device_seconds_per_call(call, reps=8, timings=5)
        print(f"score tile={tile}: {sec*1e3:7.2f} ms {cells/sec/1e9:7.2f} GCUPS", flush=True)
    except Exception as e:
        print(f"score tile={tile}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
bd, nd, md = 4096, 512, 512
td = jnp.asarray(rng.integers(0, 4, (bd, nd)), jnp.int32)
pd = jnp.asarray(rng.integers(0, 4, (bd, md)), jnp.int32)
nsd = jnp.full((bd,), nd, jnp.int32); msd = jnp.full((bd,), md, jnp.int32)
cellsd = bd * nd * md
for tile in (1024, 2048, 4096):
    def call(perturb, tile=tile):
        return batch_fill_dirs_pallas(td, pd, nsd, msd, sm, 5 + perturb,
                                      k_alpha=4, local=True, tile_pairs=tile)[0]
    try:
        sec = device_seconds_per_call(call, reps=4, timings=5)
        print(f"dirs tile={tile}: {sec*1e3:7.2f} ms {cellsd/sec/1e9:7.2f} GCUPS", flush=True)
    except Exception as e:
        print(f"dirs tile={tile}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
EOF
say "geometry rungs rc=$?"
say "chain4 complete"
