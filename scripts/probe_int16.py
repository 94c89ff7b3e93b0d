#!/usr/bin/env python3
"""Real-chip validation + measurement of the int16 cell mode.

Run on the TPU once the backend is reachable:

    timeout 3600 python scripts/probe_int16.py

Keeps new Mosaic compiles to a minimum (each costs 3-6 min via the
remote AOT helper):
  1. headline shape (8192 DNA pairs, 512x512, SW): int16 @ tile 8192 —
     scores compared against the already-cached int32 @ tile 4096, then
     GCUPS measured for both (bench/timing.py in-jit protocol);
  2. protein (k=23) packed-plane parity at one small shape vs the XLA
     engine (no Mosaic compile for the reference side).

If this prints INT16_OK and a speedup > 1, flip config.int16_cells()
default to "auto" and add the int16 candidate to bench.py.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seqalign_tpu import config as sa_config

sa_config.enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from seqalign_tpu.bench.timing import device_seconds_per_call  # noqa: E402
from seqalign_tpu.ops.pallas_fill import (  # noqa: E402
    batch_score_pallas,
    int16_cells_ok,
)


def main() -> int:
    rng = np.random.default_rng(42)
    print(f"[int16] backend: {jax.devices()}", file=sys.stderr)

    # --- 1. headline shape: parity + perf ---------------------------------
    b, n, m = 8192, 512, 512
    sm = jnp.asarray(np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32))
    texts = jnp.asarray(rng.integers(0, 4, (b, n)), jnp.int32)
    patterns = jnp.asarray(rng.integers(0, 4, (b, m)), jnp.int32)
    ns = jnp.full((b,), n, jnp.int32)
    ms = jnp.full((b,), m, jnp.int32)
    assert int16_cells_ok(n, m, np.asarray(sm), 4, 5)

    ref = np.asarray(jax.device_get(batch_score_pallas(
        texts, patterns, ns, ms, sm, 5, k_alpha=4, local=True,
        tile_pairs=4096,
    )))
    got = np.asarray(jax.device_get(batch_score_pallas(
        texts, patterns, ns, ms, sm, 5, k_alpha=4, local=True,
        tile_pairs=8192, cell16=True,
    )))
    if not (ref == got).all():
        bad = int((ref != got).sum())
        print(f"INT16_PARITY_FAIL headline: {bad}/{b} pairs differ")
        return 1
    print("[int16] headline parity ok", file=sys.stderr)

    def call32(perturb):
        return batch_score_pallas(
            texts, patterns, ns, ms, sm, 5 + perturb, k_alpha=4,
            local=True, tile_pairs=4096,
        )

    def call16(perturb):
        return batch_score_pallas(
            texts, patterns, ns, ms, sm, 5 + perturb, k_alpha=4,
            local=True, tile_pairs=8192, cell16=True,
        )

    cells = b * n * m
    t32 = device_seconds_per_call(call32, reps=16, timings=5)
    t16 = device_seconds_per_call(call16, reps=16, timings=5)
    g32 = cells / t32 / 1e9
    g16 = cells / t16 / 1e9
    print(
        f"[int16] headline: int32 {g32:.1f} GCUPS, int16 {g16:.1f} GCUPS, "
        f"speedup {g16 / g32:.2f}x",
        file=sys.stderr,
    )

    # --- 2. protein packed-plane parity (vs XLA engine) --------------------
    from seqalign_tpu.ops.batch import batch_score

    k = 23
    smp = rng.integers(-8, 12, (k, k)).astype(np.int32)
    smp = jnp.asarray(((smp + smp.T) // 2).astype(np.int32))
    bp, np_, mp_ = 1024, 128, 128
    tp = jnp.asarray(rng.integers(0, k, (bp, np_)), jnp.int32)
    pp = jnp.asarray(rng.integers(0, k, (bp, mp_)), jnp.int32)
    nsp = jnp.asarray(rng.integers(1, np_ + 1, bp), jnp.int32)
    msp = jnp.asarray(rng.integers(1, mp_ + 1, bp), jnp.int32)
    want = np.asarray(jax.device_get(batch_score(
        tp, pp, nsp, msp, smp, 10, local=True)))
    gotp = np.asarray(jax.device_get(batch_score_pallas(
        tp, pp, nsp, msp, smp, 10, k_alpha=k, local=True,
        tile_pairs=1024, cell16=True,
    )))
    if not (want == gotp).all():
        bad = int((want != gotp).sum())
        print(f"INT16_PARITY_FAIL protein: {bad}/{bp} pairs differ")
        return 1
    print("[int16] protein parity ok", file=sys.stderr)

    # --- 3. dirs kernel: Mosaic-compiled int16 vs exact interpret ----------
    # One extra Mosaic compile at a small shape validates the int16
    # lowering of the dirs-emitting body (words/best cells stay int32);
    # the interpret side is bit-exact kernel semantics, no compile.
    from seqalign_tpu.ops.pallas_fill import batch_fill_dirs_pallas

    bd, nd, md = 256, 64, 64
    td = jnp.asarray(rng.integers(0, 4, (bd, nd)), jnp.int32)
    pd = jnp.asarray(rng.integers(0, 4, (bd, md)), jnp.int32)
    nsd = jnp.asarray(rng.integers(1, nd + 1, bd), jnp.int32)
    msd = jnp.asarray(rng.integers(1, md + 1, bd), jnp.int32)
    kwd = dict(k_alpha=4, local=True, gap_extend=2, tile_pairs=bd,
               cell16=True)
    want_d = batch_fill_dirs_pallas(td, pd, nsd, msd, sm, 5,
                                    interpret=True, **kwd)
    got_d = batch_fill_dirs_pallas(td, pd, nsd, msd, sm, 5, **kwd)
    for name, w, g in zip(("scores", "best_is", "best_js", "dirs", "dirs2"),
                          want_d, got_d):
        if w is None:
            continue
        w = np.asarray(jax.device_get(w))
        g = np.asarray(jax.device_get(g))
        if not (w == g).all():
            print(f"INT16_PARITY_FAIL dirs/{name}: {int((w != g).sum())}")
            return 1
    print("[int16] dirs kernel parity ok (compiled vs interpret)",
          file=sys.stderr)

    print(
        f"INT16_OK int32={g32:.1f} int16={g16:.1f} "
        f"speedup={g16 / g32:.2f}"
    )
    if g16 > 1.05 * g32:
        # Marker consumed by bench.py: the int16 candidate joins the
        # watchdog chain (first) only after this real-chip validation,
        # and its executable is now in the shared compile cache.
        import os

        os.makedirs("bench/results", exist_ok=True)
        with open("bench/results/INT16_VALIDATED", "w") as f:
            f.write(
                f"int32={g32:.1f} int16={g16:.1f} "
                f"speedup={g16 / g32:.2f} dirs=ok\n"
            )
        print("[int16] wrote bench/results/INT16_VALIDATED", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
