#!/usr/bin/env python3
"""Calibrate the sequence-parallel routing gate's constants on one chip.

`parallel.sequence.estimated_speedup` models the pipelined chunked
fill's critical path as (num_chunks + num_strips - 1) chunk fills of
(ckpt_cols + slots) wavefront steps.  That captures the skew-ramp
re-pay but assumes zero per-chunk fixed overhead (boundary slicing,
halo bookkeeping, scan carry traffic).  This script measures it:

  T_single      = single-chip checkpointed wavefront fill of (n, m)
  T_pipe(C)     = the REAL pipeline code on a 1-device mesh with
                  ckpt_cols=C (same kernel, same scan, ppermute a
                  no-op) -> num_chunks(C) chunk fills

Per-step cost t = T_single / (n + slots); per-chunk fixed overhead in
steps o(C) = (T_pipe/num_chunks - (C + slots) * t) / t.  The o that is
stable across C is the constant the gate should add to its
(ckpt_cols + slots) term.  Run on the real chip; commit the log under
bench/results/ and fold the measured constant into
estimated_speedup's PIPE_OVERHEAD_STEPS.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seqalign_tpu import config as sa_config

sa_config.enable_compile_cache()

import jax  # noqa: E402

from seqalign_tpu.ops import checkpoint, wavefront  # noqa: E402
from seqalign_tpu.parallel import mesh as mesh_lib  # noqa: E402
from seqalign_tpu.parallel.sequence import (  # noqa: E402
    estimated_speedup,
    sequence_parallel_checkpointed_fill,
)


def _time(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    print(f"[gate] backend: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(11)
    n, m = 131_072, 4_096
    sm = np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)
    text = rng.integers(0, 4, n).astype(np.int32)
    pattern = rng.integers(0, 4, m).astype(np.int32)
    gap = 5

    mesh = mesh_lib.make_data_mesh(1)
    from seqalign_tpu.ops.checkpoint import _pick_geometry

    rps, slots = _pick_geometry(m, None, None)
    print(f"[gate] n={n} m={m} geometry rps={rps} slots={slots}",
          file=sys.stderr)

    # Warm + time the single-chip checkpoint fill (one wavefront pass).
    def single():
        ck = checkpoint.checkpointed_fill(
            text, pattern, sm, 4, gap, ckpt_cols=8192,
        )
        np.asarray(ck.boundaries)  # host sync

    single()  # compile
    t_single = _time(single)
    t_step = t_single / (n + slots)  # single pass: ckpt_cols=8192 fill
    print(f"single-chip fill: {t_single*1e3:.1f} ms "
          f"({t_step*1e9:.1f} ns/step at {n + slots} steps)")

    # ckpt_cols must be a power of two >= slots+16 (4096-slot
    # geometry => >= 8192; wavefront_strip asserts it).
    for ckpt_cols in (8192, 16384, 32768):
        num_chunks = -(-n // ckpt_cols)

        def pipe():
            ck = sequence_parallel_checkpointed_fill(
                text, pattern, sm, 4, gap, ckpt_cols=ckpt_cols,
                mesh=mesh,
            )
            np.asarray(ck.boundaries)

        pipe()  # compile
        t_pipe = _time(pipe)
        per_chunk = t_pipe / num_chunks
        model_chunk = (ckpt_cols + slots) * t_step
        o_steps = (per_chunk - model_chunk) / t_step
        print(
            f"ckpt_cols={ckpt_cols:5d}: pipe {t_pipe*1e3:7.1f} ms, "
            f"{num_chunks:3d} chunks, {per_chunk*1e3:6.2f} ms/chunk "
            f"(model {model_chunk*1e3:6.2f}) -> overhead "
            f"{o_steps:7.0f} steps/chunk"
        )

    # What the current (o=0) gate predicts for representative pod jobs.
    for nn, mm, dd in ((500_000, 16_384, 4), (1_000_000, 16_384, 8),
                       (200_000, 4_096, 4)):
        print(f"model speedup n={nn} m={mm} d={dd}: "
              f"{estimated_speedup(nn, mm, dd):.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
