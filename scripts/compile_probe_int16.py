#!/usr/bin/env python3
"""Compile-only Mosaic probe for the int16 cell mode.

AOT-compiles (no execution, works even when the chip is busy) each
cell16 kernel variant at a small shape through the remote Mosaic
helper, reporting pass/fail per variant.  Small shapes keep the helper
round-trip to ~1-2 min; a Mosaic layout rejection comes back in
seconds once lowering reaches the helper.  Use this to iterate on
Mosaic layout bugs without paying the full probe_int16.py run.

Usage: python scripts/compile_probe_int16.py [variant ...]
Variants: dna_score protein_score dirs_affine dirs_local (default all).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seqalign_tpu import config as sa_config

sa_config.enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from seqalign_tpu.ops import pallas_fill  # noqa: E402


def _compile(fn, *args):
    jax.jit(fn).lower(*args).compile()


def main(argv) -> int:
    rng = np.random.default_rng(7)
    b, n, m = 256, 64, 64
    sm4 = jnp.asarray(np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32))
    k = 23
    smp = rng.integers(-8, 12, (k, k)).astype(np.int32)
    smp = jnp.asarray(((smp + smp.T) // 2).astype(np.int32))
    texts4 = jnp.asarray(rng.integers(0, 4, (b, n)), jnp.int32)
    pats4 = jnp.asarray(rng.integers(0, 4, (b, m)), jnp.int32)
    textsp = jnp.asarray(rng.integers(0, k, (b, n)), jnp.int32)
    patsp = jnp.asarray(rng.integers(0, k, (b, m)), jnp.int32)
    ns = jnp.full((b,), n, jnp.int32)
    ms = jnp.full((b,), m, jnp.int32)

    variants = {
        "dna_score": lambda: _compile(
            lambda t, p: pallas_fill.batch_score_pallas(
                t, p, ns, ms, sm4, 5, k_alpha=4, local=True,
                tile_pairs=b, cell16=True,
            ), texts4, pats4),
        "protein_score": lambda: _compile(
            lambda t, p: pallas_fill.batch_score_pallas(
                t, p, ns, ms, smp, 10, k_alpha=k, local=True,
                tile_pairs=b, cell16=True,
            ), textsp, patsp),
        "dirs_affine": lambda: _compile(
            lambda t, p: pallas_fill.batch_fill_dirs_pallas(
                t, p, ns, ms, sm4, 5, k_alpha=4, local=True,
                gap_extend=2, tile_pairs=b, cell16=True,
            ), texts4, pats4),
        "dirs_local": lambda: _compile(
            lambda t, p: pallas_fill.batch_fill_dirs_pallas(
                t, p, ns, ms, sm4, 5, k_alpha=4, local=True,
                tile_pairs=b, cell16=True,
            ), texts4, pats4),
    }
    todo = argv[1:] or list(variants)
    print(f"[compile-probe] backend: {jax.devices()}", file=sys.stderr)
    failed = []
    for name in todo:
        try:
            variants[name]()
            print(f"COMPILE_OK {name}")
        except Exception as e:  # report and keep probing the rest
            msg = str(e).splitlines()
            head = next(
                (l for l in msg if "Mosaic" in l or "relayout" in l.lower()),
                msg[0] if msg else "",
            )
            print(f"COMPILE_FAIL {name}: {head[:300]}")
            failed.append(name)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
