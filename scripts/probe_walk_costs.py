#!/usr/bin/env python3
"""Microbenchmarks for traceback-walker design choices (dev probe).

Measures on the real chip:
  * pallas-chase: a dependent chain of dynamic scalar loads from VMEM
    inside a Pallas kernel (per-step cost of an in-kernel walker).
  * xla-chase: the current device_walk gather chain (baseline ~us/step).
  * batch-walk: a vmapped while_loop walk over B pairs (per-step cost of
    the batched traceback design — gathers amortize across the batch).

Usage: python scripts/probe_walk_costs.py [pallas|xla|batch ...]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe_pallas_chase():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from seqalign_tpu.bench.timing import device_seconds_per_call

    ROWS, LANE = 4096, 128  # 2 MiB table in VMEM
    STEPS = 262144  # big enough that ~10 ns/step clears the noise floor

    def kernel(seed_ref, tab_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)

        def body(k, carry):
            acc, r0, r2 = carry
            # Mosaic has no dynamic-lane scalar load: load the (1, 128)
            # row and extract the lane with a masked reduce.
            row = tab_ref[pl.ds(r0, 1), :]
            v = jnp.sum(jnp.where(lane == r2, row, 0))
            acc = acc + v
            r0 = (v + k) & (ROWS - 1)
            r2 = (v >> 6) & (LANE - 1)
            return acc, r0, r2

        acc, _, _ = jax.lax.fori_loop(
            0, STEPS, body,
            (seed_ref[0, 0], seed_ref[0, 0] & (ROWS - 1), jnp.int32(0)),
        )
        out_ref[0, 0] = acc

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.integers(0, 1 << 20, (ROWS, LANE)), jnp.int32)

    @jax.jit
    def call(perturb):
        seed = jnp.asarray(perturb, jnp.int32).reshape(1, 1)
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        )(seed, tab)

    sec = device_seconds_per_call(call, reps=8)
    print(f"pallas-chase: {sec / STEPS * 1e9:.0f} ns/step "
          f"({sec * 1e3:.2f} ms / {STEPS} steps)", flush=True)


def probe_xla_chase():
    import jax
    import jax.numpy as jnp

    from seqalign_tpu.bench.timing import device_seconds_per_call

    W, P = 4096, 8192  # 128 MiB words array in HBM
    STEPS = 4096
    rng = np.random.default_rng(0)
    words = jnp.asarray(rng.integers(0, 1 << 20, (W, P)), jnp.int32)

    @jax.jit
    def call(perturb):
        def body(k, carry):
            acc, r, c = carry
            v = words[r, c]
            acc = acc + v
            r = (v + k + perturb) & (W - 1)
            c = (v >> 5) & (P - 1)
            return acc, r, c

        acc, _, _ = jax.lax.fori_loop(
            0, STEPS, body,
            (jnp.int32(0), jnp.asarray(perturb) & (W - 1), jnp.int32(0)),
        )
        return acc

    sec = device_seconds_per_call(call, reps=4)
    print(f"xla-chase: {sec / STEPS * 1e9:.0f} ns/step "
          f"({sec * 1e3:.2f} ms / {STEPS} steps)", flush=True)


def probe_batch_walk():
    import jax
    import jax.numpy as jnp

    from seqalign_tpu.bench.timing import device_seconds_per_call

    B, W, P = 1024, 32, 512  # 1024 pairs of 512^2 packed words (64 MiB)
    STEPS = 1024
    rng = np.random.default_rng(0)
    words = jnp.asarray(rng.integers(0, 1 << 30, (B, W, P)), jnp.int32)

    @jax.jit
    def call(perturb):
        def body(k, carry):
            acc, i, j, out, kk = carry
            w = jnp.take_along_axis(
                words.reshape(B, W * P),
                (i * P + j).reshape(B, 1) + perturb * 0,
                axis=1,
            ).reshape(B)
            d = (w >> 2 * (k % 16)) & 3
            out = out.at[jnp.arange(B), kk].set(d)
            kk = kk + 1
            acc = acc + d
            i = jnp.clip(i - (d & 1), 0, W - 1)
            j = jnp.clip(j - ((d >> 1) & 1), 0, P - 1)
            return acc, i, j, out, kk

        acc0 = jnp.zeros((B,), jnp.int32)
        i0 = jnp.full((B,), W - 1, jnp.int32) + perturb * 0
        j0 = jnp.full((B,), P - 1, jnp.int32)
        out0 = jnp.zeros((B, STEPS), jnp.int32)
        kk0 = jnp.zeros((B,), jnp.int32)
        acc, _, _, out, _ = jax.lax.fori_loop(
            0, STEPS, body, (acc0, i0, j0, out0, kk0)
        )
        return acc + out[0, 0]

    sec = device_seconds_per_call(call, reps=2)
    print(
        f"batch-walk: {sec / STEPS * 1e6:.1f} us/step for {B} pairs "
        f"({sec / STEPS / B * 1e9:.2f} ns/pair-step; "
        f"{sec * 1e3:.1f} ms / {STEPS} steps)",
        flush=True,
    )


def probe_walker_kernels():
    """Head-to-head: pallas_walk_skewed_window vs device_walk_skewed_window
    on one production-geometry tile's worth of words."""
    import jax.numpy as jnp

    from seqalign_tpu.bench.timing import device_seconds_per_call
    from seqalign_tpu.ops.pallas_walk import pallas_walk_skewed_window
    from seqalign_tpu.ops.traceback import device_walk_skewed_window

    rng = np.random.default_rng(0)
    rps, slots = 4, 4096
    srows = slots // 128
    tile_steps = 36864
    w_rows = tile_steps // 16 * rps
    rows = rps * slots
    # Random global-mode dirs (0..2): the walk from the far corner runs
    # a full ~(rows + cols)-step path to the window edge.
    words = jnp.asarray(
        rng.integers(-(1 << 31), 1 << 31, (w_rows, srows, 128), dtype=np.int64
                     ).astype(np.int32)
    )
    # Mask out STOP bits: dirs = word & 0b10 pattern can yield 3; force
    # valid 0..2 by clearing one bit of each 2-bit field where both set.
    both = jnp.asarray(0x55555555, jnp.int32)
    w = words & ~((words >> 1) & words & both)  # clear low bit where '11'
    i0, j0 = rows, 32768
    max_moves = rows + 32768 + 1

    def call_pallas(perturb):
        mv, k, i, j, st, done = pallas_walk_skewed_window(
            w, None, rps, 0, 0, i0, j0 + perturb * 0, 0, False, False,
            max_moves,
        )
        return k

    def call_xla(perturb):
        out, k, i, j, done = device_walk_skewed_window(
            w, rps, 0, 0, i0, j0 + perturb * 0, False, max_moves
        )
        return k

    import jax

    k = int(jax.device_get(call_pallas(jnp.asarray(0, jnp.int32))))
    print(f"walker probe: path length {k} moves")
    for name, fn in (("pallas-walker", call_pallas), ("xla-walker", call_xla)):
        sec = device_seconds_per_call(fn, reps=3)
        print(f"{name}: {sec * 1e3:8.2f} ms/walk  "
              f"{sec / max(k, 1) * 1e9:7.0f} ns/move", flush=True)


PROBES = {
    "pallas": probe_pallas_chase,
    "xla": probe_xla_chase,
    "batch": probe_batch_walk,
    "walker": probe_walker_kernels,
}


if __name__ == "__main__":
    which = sys.argv[1:] or list(PROBES)
    for name in which:
        try:
            PROBES[name]()
        except Exception as e:  # keep probing the rest
            print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
