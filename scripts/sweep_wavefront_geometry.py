#!/usr/bin/env python3
"""Geometry sweep for the single-pair wavefront fill (dirs included).

Measures GCUPS of one strip sweep across (rps, slots) blockings to find
the best with-dirs geometry (VERDICT: push single-pair with-dirs fill
toward chip speed of light; round-1 best was 79 GCUPS at rps=4/4096).

Usage: python scripts/sweep_wavefront_geometry.py [n] [--local] [--dna]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax.numpy as jnp

    from seqalign_tpu.bench.timing import device_seconds_per_call
    from seqalign_tpu.ops import wavefront as wf

    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 32768
    local = "--local" in sys.argv
    dna = "--dna" in sys.argv
    k = 4 if dna else 23
    rng = np.random.default_rng(0)
    if dna:
        sm = np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)
    else:
        from seqalign_tpu import constants
        from seqalign_tpu.io import parse_score_matrix_file

        smf = np.zeros((24, 24), np.int32)
        parse_score_matrix_file(
            constants.DEFAULT_PROTEIN_SCORE_MATRIX_FILE, 23, smf
        )
        sm = smf[:23, :23]
    sm_j = jnp.asarray(sm)
    text = rng.integers(0, k, n).astype(np.int32)

    if "--deep" in sys.argv:
        geoms = [(16, 4096), (8, 8192), (16, 2048), (32, 2048),
                 (16, 8192), (32, 4096)]
    else:
        geoms = [(8, 4096), (4, 4096), (2, 8192), (4, 8192), (1, 16384),
                 (2, 4096), (8, 2048)]
    print(f"wavefront with-dirs sweep: n={n} {'local' if local else 'global'}"
          f" k={k}")
    for rps, slots in geoms:
        rows = rps * slots
        steps_pad = -(-(n + slots - 1) // wf.STEPS) * wf.STEPS
        nb = steps_pad // wf.STEPS
        ts = jnp.asarray(np.pad(text, (0, steps_pad - n)).reshape(nb, wf.STEPS))
        bot = jnp.zeros((nb, wf.STEPS), jnp.int32)
        pat = jnp.asarray(
            rng.integers(0, k, rows)
            .astype(np.int32)
            .reshape(slots, rps)
            .T.reshape(rps, slots // 128, 128)
        )

        def call(perturb):
            outs = wf.wavefront_strip(
                ts, bot, pat, sm_j, 5 + perturb, n, rows, 0,
                k_alpha=k, local=local, with_dirs=True,
                rps=rps, slots=slots,
            )
            return outs[2]

        try:
            sec = device_seconds_per_call(call, reps=4)
        except Exception as e:
            print(f"rps={rps} slots={slots}: FAILED {str(e)[:120]}",
                  flush=True)
            continue
        cells = rows * n
        print(
            f"rps={rps} slots={slots} (strip {rows} rows): "
            f"{sec * 1e3:8.2f} ms/strip  {cells / sec / 1e9:7.1f} GCUPS",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
