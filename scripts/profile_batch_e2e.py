#!/usr/bin/env python3
"""Phase breakdown of the batch end-to-end align path (north-star
workload): host prep / upload / fill+walk dispatch / download / native
bucket emit / result assembly.  Guides e2e optimization — run on the
real chip.

Usage: python scripts/profile_batch_e2e.py [--pairs 8192] [--size 256]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=8192)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import numpy as np

    from seqalign_tpu import config
    config.enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from seqalign_tpu.parallel.batch import BatchAligner

    rng = np.random.default_rng(9)
    sm = np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)
    texts = [rng.integers(0, 4, args.size).astype(np.int32)
             for _ in range(args.pairs)]
    patterns = [rng.integers(0, 4, args.size).astype(np.int32)
                for _ in range(args.pairs)]
    aligner = BatchAligner(sm, 4, 5, local=True)

    for rep in range(args.reps):
        t0 = time.time()
        results = aligner.align(texts, patterns)
        t1 = time.time()
        assert all(r is not None for r in results)
        print(f"rep{rep}: full_align={t1-t0:.3f}s")

    # Mirror _align_bucket's stages with explicit sync points.
    n_pad = m_pad = args.size
    tile_pairs = aligner._dirs_tile_pairs(n_pad, m_pad, args.pairs, 1)
    b = args.pairs
    quantum = tile_pairs
    b_pad = max(quantum, -(-b // quantum) * quantum)

    t0 = time.time()
    t_arr = np.zeros((b_pad, n_pad), dtype=np.int8)
    p_arr = np.zeros((b_pad, m_pad), dtype=np.int8)
    ns = np.zeros(b_pad, dtype=np.int32)
    ms = np.zeros(b_pad, dtype=np.int32)
    for row in range(b):
        t_arr[row] = texts[row]
        p_arr[row] = patterns[row]
        ns[row], ms[row] = args.size, args.size
    t1 = time.time()

    fw_keys = list(aligner._fill_walk_fns)
    print(f"tile_pairs={tile_pairs} cached fill_walk keys: {fw_keys}")
    fn = aligner._fill_walk_fns[fw_keys[0]]
    smx = aligner.score_matrix

    # Mirror _align_bucket's DNA upload: 2-bit packed letters.
    from seqalign_tpu.parallel.batch import pack_letters_host

    t_up = pack_letters_host(t_arr)
    p_up = pack_letters_host(p_arr)
    for rep in range(args.reps):
        t1 = time.time()
        jt, jp, jns, jms = (jnp.asarray(t_up), jnp.asarray(p_up),
                            jnp.asarray(ns), jnp.asarray(ms))
        jax.block_until_ready((jt, jp, jns, jms))
        t2 = time.time()
        out = fn(jt, jp, jns, jms, smx)
        jax.block_until_ready(out)
        t3 = time.time()
        host = jax.device_get(out)
        t4 = time.time()
        print(
            f"rep{rep}: prep={t1-t0:.3f}s "
            f"upload({(t_up.nbytes+p_up.nbytes)/1e6:.0f}MB)={t2-t1:.3f}s "
            f"fill+walk={t3-t2:.3f}s "
            f"download({sum(np.asarray(a).nbytes for a in host)/1e6:.1f}MB)"
            f"={t4-t3:.3f}s"
        )
        t0 = t4

    from seqalign_tpu.native import bindings

    scores, bis, bjs, packed, lens, j_fin, i_fin = (
        np.asarray(a) for a in host
    )
    t0 = time.time()
    at_all, ap_all, st_all, sp_all = bindings.emit_moves_batch(
        packed.T, lens, bis, bjs, 1, t_arr, p_arr, 4
    )
    t1 = time.time()
    out_res = []
    for row in range(b):
        ln = int(lens[row])
        out_res.append((
            at_all[row, :ln].copy(), ap_all[row, :ln].copy(),
            int(st_all[row]), int(sp_all[row]), int(scores[row]),
        ))
    t2 = time.time()
    print(
        f"native emit={t1-t0:.3f}s result_loop={t2-t1:.3f}s "
        f"({(t2-t0)/b*1e6:.1f} us/pair host assembly)"
    )


if __name__ == "__main__":
    main()
