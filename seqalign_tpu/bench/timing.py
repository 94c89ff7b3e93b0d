"""Timing helpers that survive the remote-dispatch latency.

A single dispatch to the TPU costs a fixed host<->device round trip
(tens of ms through tunneled transports), so naive wall-clock timing of
one call measures latency, not throughput.  The repeat harness runs K
iterations inside one jitted fori_loop with an un-hoistable data
dependency (the gap penalty is perturbed by min(acc, 0), which is zero
at runtime but can't be proven so), and differences out the fixed cost.
This replaces the reference's invasive BENCHMARK macro that changed the
engine's return type (alignSequenceGPU.cu:555-626).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def device_seconds_per_call(make_call: Callable[[jax.Array], jax.Array],
                            reps: int = 4, timings: int = 3) -> float:
    """Average device seconds per call of ``make_call(gap_perturbation)``.

    make_call receives an int32 scalar that is 0 at runtime and must fold
    it into its computation (e.g. gap + perturbation); it returns an
    int32 scalar/array whose sum feeds the next iteration.

    Each wall timing is taken ``timings`` times and medianed before
    differencing — min-of-differences would be biased fast whenever the
    1-rep baseline draws a slow outlier (the tunneled transport has
    heavy timing noise).
    """

    # The repeat count is a TRACED argument so both the 1-rep baseline
    # and the K-rep run share ONE compiled executable — cold-start cost
    # through the remote AOT compile helper is paid once, not twice
    # (round 2's driver bench timed out on exactly that double compile).
    @jax.jit
    def repeat(k):
        def body(_, acc):
            out = make_call(jnp.minimum(acc, 0))
            return acc + jnp.sum(out).astype(jnp.int32)

        return jax.lax.fori_loop(0, k, body, jnp.asarray(0, jnp.int32))

    def timed(k):
        t0 = time.time()
        jax.device_get(repeat(jnp.asarray(k, jnp.int32)))
        return time.time() - t0

    timed(1)
    timed(1 + reps)
    t_one = sorted(timed(1) for _ in range(timings))[timings // 2]
    t_many = sorted(timed(1 + reps) for _ in range(timings))[timings // 2]
    return max((t_many - t_one) / reps, 1e-9)


def wall_seconds(fn: Callable[[], None], repeats: int = 3) -> float:
    """Best-of-N wall-clock timing of a host-level call (the reference's
    end-to-end protocol, tests/benchmarks.cu:44-52)."""
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best
