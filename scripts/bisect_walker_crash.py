#!/usr/bin/env python3
"""Bisect the on-chip TPU worker crash seen in the round-4 batched
align parity probe (64 ragged 100-400nt pairs, global mode).

Runs each stage separately with a device sync between, so the log
shows exactly which dispatch kills the worker:
  1. batch_fill_dirs_pallas alone (colprof on, then off)
  2. the per-pair Pallas walker alone on those dirs
  3. the lockstep walk on the same dirs (control)
Shapes mirror the failing probe: bucketed ragged pairs, global mode.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seqalign_tpu import config as sa_config

sa_config.enable_compile_cache()

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from seqalign_tpu.ops.batch_traceback import (  # noqa: E402
    batch_device_traceback,
    batch_pallas_traceback,
)
from seqalign_tpu.ops.pallas_fill import batch_fill_dirs_pallas  # noqa: E402


def sync(x):
    return np.asarray(jax.device_get(x))


def main() -> int:
    print(f"[bisect] backend: {jax.devices()}", flush=True)
    rng = np.random.default_rng(31)
    sm = jnp.asarray(np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32))
    b = 128
    n_pad, m_pad = 512, 384  # the failing bucket's padded shape family
    ns = rng.integers(100, 400, b).astype(np.int32)
    ms = rng.integers(80, 380, b).astype(np.int32)
    texts = np.zeros((b, n_pad), dtype=np.int32)
    pats = np.zeros((b, m_pad), dtype=np.int32)
    for i in range(b):
        texts[i, : ns[i]] = rng.integers(0, 4, ns[i])
        pats[i, : ms[i]] = rng.integers(0, 4, ms[i])
    texts = jnp.asarray(texts)
    pats = jnp.asarray(pats)
    nsj = jnp.asarray(ns)
    msj = jnp.asarray(ms)
    max_len = -(-(n_pad + m_pad) // 16) * 16

    for colprof in (True, False):
        print(f"--- fill dirs, colprof={colprof} (global) ---", flush=True)
        scores, bis, bjs, dirs, dirs2 = batch_fill_dirs_pallas(
            texts, pats, nsj, msj, sm, 5, k_alpha=4,
            tile_pairs=128, colprof=colprof,
        )
        print("fill ok, scores[:4] =", sync(scores)[:4], flush=True)

        print(f"--- lockstep walk on those dirs ---", flush=True)
        pk, ln, fi, fj = batch_device_traceback(
            dirs, nsj, msj, bis, bjs, local=False, semi=False,
            max_len=max_len,
        )
        print("lockstep ok, lens[:4] =", sync(ln)[:4], flush=True)

        print(f"--- per-pair walker on those dirs ---", flush=True)
        pk2, ln2, fi2, fj2 = batch_pallas_traceback(
            dirs, nsj, msj, bis, bjs, local=False, semi=False,
            max_len=max_len,
        )
        print("walker ok, lens[:4] =", sync(ln2)[:4], flush=True)
        from seqalign_tpu.ops.batch_traceback import unpack_batch_moves

        lna, ln2a, pka, pk2a = sync(ln), sync(ln2), sync(pk), sync(pk2)
        assert np.array_equal(lna, ln2a), "walker/lockstep lens"
        for i in range(b):
            # Only the first len moves are defined; trailing words are
            # unwritten in the walker and zeroed in the lockstep walk.
            assert np.array_equal(
                unpack_batch_moves(pka, int(lna[i]), i),
                unpack_batch_moves(pk2a, int(ln2a[i]), i),
            ), f"moves differ for pair {i}"
        print("walker == lockstep", flush=True)
    print("BISECT COMPLETE — no crash", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
