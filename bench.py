#!/usr/bin/env python3
"""Headline benchmark: batched Smith-Waterman fill throughput (GCUPS).

Prints ONE JSON line:
  {"metric": "sw_batch_fill", "value": <GCUPS>, "unit": "GCUPS",
   "vs_baseline": <value / 14.354>}

Baseline: the reference's best single-chip fill throughput, 14,354 MCUPS
(Smith-Waterman 16384x32768 on a V100-SXM2,
reference tests/benchmarkResults/benchmark_throughput_tesla.out:64-66).

Robustness: Mosaic kernel compiles go through a remote AOT helper that
can take many minutes cold (round 2's driver run timed out on exactly
this), so this script is a WATCHDOG ORCHESTRATOR: each candidate
configuration is measured in a subprocess with a hard deadline, falling
back from the fastest geometry (4096 pairs/grid-step) to a smaller one
and finally to a pure-XLA engine that never needs a Mosaic compile.
The first candidate to finish wins.  All candidates share the
persistent compile cache, and the timing harness compiles ONE
executable per candidate (traced repeat count, bench/timing.py).

  python bench.py          # headline run (watchdog + fallbacks)
  python bench.py --warm   # precompile every candidate into the cache

Timing protocol: the fill is repeated inside one jitted fori_loop with a
data dependency between iterations, so the measurement excludes the
host<->device round-trip latency and compile time (the reference's
fill-only timing likewise excludes setup; it includes the D2H of the
direction matrix, which our engine does not need — traceback consumes
direction bits from device memory).
"""

import json
import os
import signal
import subprocess
import sys

BASELINE_GCUPS = 14.354
# Persistent compile cache: config.enable_compile_cache() (default
# /tmp/jax_comp_cache; SEQALIGN_COMPILE_CACHE overrides) — the same
# cache every other entry path (CLI, batch API) points at, so warm
# runs here warm the cache those paths read.

# (name, deadline_seconds).  Deadlines are sized so a fully cold Mosaic
# compile (~3-6 min via the remote AOT helper) still fits, while a
# pathological compile can't eat the driver's whole window; the XLA
# fallback compiles locally in under a minute.
CANDIDATES = (
    # tile8192u: the headline workload is uniform-length (every pair
    # exactly 512x512), so the per-cell validity masking is dead weight;
    # uniform=True drops ~3 of ~15 VPU ops/cell (kernel contract in
    # ops/pallas_fill.py, parity pinned by tests/test_uniform_fastpath).
    ("tile8192u", 780),
    # tile8192 needs the colprof lookup (default on): the packed-column
    # substitution frees the select-chain plane registers, which is what
    # made 8192 pairs/grid-step profitable (372 vs 322 GCUPS at 4096;
    # without colprof 8192 regressed to ~300 — r4_colprof_tiles.out).
    ("tile8192", 780),
    ("tile4096", 720),
    ("tile1024", 600),
    ("xla", 360),
)

# The int16 cell-mode candidate (2 DP cells per VPU lane, 8192-pair
# tiles) joins the chain FIRST, but only after scripts/probe_int16.py
# has validated parity + speedup on the real chip and warmed its
# executable into the shared cache (it writes this marker).  Its
# deadline is short on purpose: the probe just compiled this exact
# executable into the shared cache, so a run here is load-only
# (~1 min); a miss means something is off and the chain should fall
# through without eating the driver window.
_INT16_MARKER = "bench/results/INT16_VALIDATED"
if os.path.exists(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), _INT16_MARKER)
):
    CANDIDATES = (("int16", 270),) + CANDIDATES


def _measure(name: str) -> None:
    """Child process: measure one candidate, print the JSON line."""
    import numpy as np

    import jax.numpy as jnp

    from seqalign_tpu import config as sa_config

    sa_config.enable_compile_cache()

    from seqalign_tpu.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()  # no-op single-host

    from seqalign_tpu.bench.timing import device_seconds_per_call

    rng = np.random.default_rng(42)

    # 2.1 Gcell workload: 8192 DNA pairs of 512x512, one pair per vector
    # slot of the inter-pair Pallas kernel (xla: vmapped scan engine).
    b, n, m = 8192, 512, 512
    sm = jnp.asarray(np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32))
    texts = jnp.asarray(rng.integers(0, 4, (b, n)), jnp.int32)
    patterns = jnp.asarray(rng.integers(0, 4, (b, m)), jnp.int32)
    ns = jnp.full((b,), n, jnp.int32)
    ms = jnp.full((b,), m, jnp.int32)

    if name == "xla":
        from seqalign_tpu.ops.batch import batch_score

        def call(perturb):
            return batch_score(
                texts, patterns, ns, ms, sm, 5 + perturb, local=True
            )

        reps = 4
    else:
        from seqalign_tpu.ops.pallas_fill import batch_score_pallas

        tile_pairs = {"int16": 8192, "tile8192u": 8192, "tile8192": 8192,
                      "tile4096": 4096, "tile1024": 1024}[name]
        cell16 = name == "int16"
        uniform = name == "tile8192u"

        def call(perturb):
            return batch_score_pallas(
                texts, patterns, ns, ms, sm, 5 + perturb,
                k_alpha=4, local=True, tile_pairs=tile_pairs,
                cell16=cell16, uniform=uniform,
            )

        reps = 16

    per_batch = device_seconds_per_call(call, reps=reps, timings=5)

    cells = b * n * m
    gcups = cells / per_batch / 1e9
    pairs_per_s = b / per_batch
    print(
        f"[bench:{name}] {b} pairs {n}x{m}: {per_batch * 1e3:.1f} ms/batch, "
        f"{pairs_per_s:,.0f} pairs/s, {gcups:.2f} GCUPS",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "sw_batch_fill",
                "value": round(gcups, 3),
                "unit": "GCUPS",
                "vs_baseline": round(gcups / BASELINE_GCUPS, 4),
            }
        )
    )


def _run_candidate(name: str, deadline: float) -> str | None:
    """Run one candidate in a subprocess; return its JSON line or None."""
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--measure", name],
        stdout=subprocess.PIPE,
        stderr=sys.stderr,
        text=True,
        start_new_session=True,  # own process group for a clean kill
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    try:
        out, _ = proc.communicate(timeout=deadline)
    except subprocess.TimeoutExpired:
        print(
            f"[bench] candidate {name} exceeded {deadline:.0f}s; killing",
            file=sys.stderr,
        )
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except OSError:
            pass
        proc.wait()
        return None
    if proc.returncode != 0:
        print(
            f"[bench] candidate {name} exited rc={proc.returncode}",
            file=sys.stderr,
        )
        return None
    for line in reversed(out.splitlines()):
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            return line
    return None


def _backend_reachable(deadline: float = 180.0) -> bool:
    """Probe the accelerator backend in a subprocess (init HANGS when
    the tunnel is down, so the probe needs its own deadline)."""
    try:
        rc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=deadline,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        ).returncode
        return rc == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    if "--measure" in sys.argv:
        _measure(sys.argv[sys.argv.index("--measure") + 1])
        return

    # Fail fast (with one retry — transient blips happen) when the
    # backend is unreachable: every candidate needs the chip, and
    # letting them all hang to their deadlines would eat ~30 min of
    # the caller's window for a run that cannot succeed.
    if not os.environ.get("SEQALIGN_BENCH_SKIP_PROBE"):
        if not _backend_reachable() and not _backend_reachable():
            print(
                "[bench] accelerator backend unreachable (2 probes); "
                "no candidate can run",
                file=sys.stderr,
            )
            sys.exit(1)

    if "--warm" in sys.argv:
        # Populate the persistent compile cache for every candidate so a
        # later cold headline run is executable-load-only.  Run this
        # after ANY edit that touches the measured kernels or harness.
        for name, _ in CANDIDATES:
            print(f"[bench] warming {name} ...", file=sys.stderr)
            line = _run_candidate(name, deadline=2400)
            print(f"[bench] warmed {name}: {line}", file=sys.stderr)
        return

    forced = os.environ.get("SEQALIGN_BENCH_CANDIDATE")
    order = [c for c in CANDIDATES if forced is None or c[0] == forced]
    for name, deadline in order:
        line = _run_candidate(name, deadline)
        if line is not None:
            print(line)
            return
    print("[bench] all candidates failed", file=sys.stderr)
    sys.exit(1)


if __name__ == "__main__":
    main()
