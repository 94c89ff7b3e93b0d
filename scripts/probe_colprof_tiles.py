#!/usr/bin/env python3
"""On-chip A/B of the headline kernel: {tile 4096, 8192} x {colprof,
select-chain}.

colprof removes the three per-row select-chain plane vectors (12 live
(8,128) vregs at sub_rows=32), so 8192 pairs/grid-step — which
regressed on register/VMEM pipeline pressure with the chain lookup —
may become the better geometry.  Timing: in-jit repeats
(bench.timing.device_seconds_per_call), one executable per candidate.

Run on the real chip; commit the log under bench/results/.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seqalign_tpu import config as sa_config

sa_config.enable_compile_cache()

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from seqalign_tpu.bench.timing import device_seconds_per_call  # noqa: E402
from seqalign_tpu.ops.pallas_fill import batch_score_pallas  # noqa: E402


def main() -> int:
    print(f"[probe] backend: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(42)
    b, n, m = 8192, 512, 512
    sm = jnp.asarray(np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32))
    texts = jnp.asarray(rng.integers(0, 4, (b, n)), jnp.int32)
    patterns = jnp.asarray(rng.integers(0, 4, (b, m)), jnp.int32)
    ns = jnp.full((b,), n, jnp.int32)
    ms = jnp.full((b,), m, jnp.int32)
    cells = b * n * m

    for tile in (4096, 8192):
        for colprof in (True, False):
            def call(perturb):
                return batch_score_pallas(
                    texts, patterns, ns, ms, sm, 5 + perturb,
                    k_alpha=4, local=True, tile_pairs=tile,
                    colprof=colprof,
                )

            try:
                per_batch = device_seconds_per_call(call, reps=16, timings=5)
            except Exception as e:  # compile failures are findings too
                print(f"tile={tile} colprof={colprof}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                continue
            print(
                f"tile={tile} colprof={colprof}: "
                f"{per_batch * 1e3:6.2f} ms/batch "
                f"{cells / per_batch / 1e9:7.2f} GCUPS",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
