#!/usr/bin/env python3
"""Headline benchmark: batched Smith-Waterman fill throughput (GCUPS).

Prints ONE JSON line:
  {"metric": "sw_batch_fill", "value": <GCUPS>, "unit": "GCUPS",
   "vs_baseline": <value / 14.354>}

Baseline: the reference's best single-chip fill throughput, 14,354 MCUPS
(Smith-Waterman 16384x32768 on a V100-SXM2,
reference tests/benchmarkResults/benchmark_throughput_tesla.out:64-66).

Timing protocol: the fill is repeated inside one jitted fori_loop with a
data dependency between iterations, so the measurement excludes the
host<->device round-trip latency and compile time (the reference's
fill-only timing likewise excludes setup; it includes the D2H of the
direction matrix, which our engine does not need — traceback consumes
direction bits from device memory).
"""

import json
import sys

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    try:  # persistent compile cache (best-effort; remote AOT may bypass)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    except Exception:
        pass

    from seqalign_tpu.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()  # no-op single-host

    from seqalign_tpu.bench.timing import device_seconds_per_call
    from seqalign_tpu.ops.pallas_fill import batch_score_pallas

    rng = np.random.default_rng(42)

    # 2.1 Gcell workload: 8192 DNA pairs of 512x512 through the inter-pair
    # Pallas kernel (4096 pairs per grid step, one pair per vector slot).
    b, n, m = 8192, 512, 512
    sm = jnp.asarray(np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32))
    texts = jnp.asarray(rng.integers(0, 4, (b, n)), jnp.int32)
    patterns = jnp.asarray(rng.integers(0, 4, (b, m)), jnp.int32)
    ns = jnp.full((b,), n, jnp.int32)
    ms = jnp.full((b,), m, jnp.int32)

    def call(perturb):
        return batch_score_pallas(
            texts, patterns, ns, ms, sm, 5 + perturb, k_alpha=4, local=True
        )

    per_batch = device_seconds_per_call(call, reps=16, timings=5)

    cells = b * n * m
    gcups = cells / per_batch / 1e9
    pairs_per_s = b / per_batch
    print(
        f"[bench] {b} pairs {n}x{m}: {per_batch * 1e3:.1f} ms/batch, "
        f"{pairs_per_s:,.0f} pairs/s, {gcups:.2f} GCUPS",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "sw_batch_fill",
                "value": round(gcups, 3),
                "unit": "GCUPS",
                "vs_baseline": round(gcups / 14.354, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
