"""Benchmark suite (capability of reference tests/benchmarks.cu).

Reproduces the reference's benchmark grids with a runtime CLI instead of
compile-time macro/comment toggles (benchmarks.cu:2-5, 366-403):

  * fill throughput (MCUPS) over square global and rectangular local
    sizes (benchmarks.cu:102-189),
  * end-to-end latency incl. traceback (benchmarks.cu:191-269),
  * batch scaling (benchmarks.cu:271-332),
  * max-length probe (benchmarks.cu:335-363).

Random protein requests mirror fillDummyRequest (benchmarks.cu:21-42).

Usage:
  python -m seqalign_tpu.bench.suite throughput [--local] [--sizes ...]
  python -m seqalign_tpu.bench.suite latency
  python -m seqalign_tpu.bench.suite batch
  python -m seqalign_tpu.bench.suite maxlength
  python -m seqalign_tpu.bench.suite engines   # kernel comparison
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants
from ..ops import pallas_fill
from .timing import device_seconds_per_call, wall_seconds

NUM_REPEATS = 5  # best-of, like the reference (benchmarks.cu:5)


def _random_protein(rng, n):
    return rng.integers(0, constants.NUM_PROTEIN_CHARS, n).astype(np.int32)


def _blosum50():
    from ..io import parse_score_matrix_file
    from ..types import Request

    request = Request()
    request.set_sequence_type(constants.SequenceType.PROTEIN)
    parse_score_matrix_file(
        constants.DEFAULT_PROTEIN_SCORE_MATRIX_FILE,
        request.alphabet_size,
        request.score_matrix,
    )
    return np.asarray(request.score_matrix[:23, :23], dtype=np.int32)


def _pair_fill_seconds(n, m, local, rng, sm) -> float:
    """Device seconds for one single-pair fill (dirs included), through
    the wavefront kernel: per-strip device time x number of strips."""
    import jax.numpy as jnp

    from ..ops import wavefront as wf

    from ..ops import direct

    text = _random_protein(rng, n)
    rps, slots = direct._direct_geometry(m)
    steps_pad = -(-(n + slots - 1) // wf.STEPS) * wf.STEPS
    nb = steps_pad // wf.STEPS
    ts = jnp.asarray(
        np.pad(text, (0, steps_pad - n)).reshape(nb, wf.STEPS)
    )
    bot = jnp.zeros((nb, wf.STEPS), jnp.int32)
    pat = jnp.asarray(
        _random_protein(rng, rps * slots).reshape(rps, slots // 128, 128)
    )
    sm_j = jnp.asarray(sm)

    def call(perturb):
        dirs, bo, rm, aj, sn, _ = wf.wavefront_strip(
            ts, bot, pat, sm_j, 5 + perturb, n, m, 0,
            k_alpha=23, local=local, with_dirs=True, rps=rps, slots=slots,
        )
        return rm

    per_strip = device_seconds_per_call(call, reps=NUM_REPEATS)
    num_strips = -(-m // (rps * slots))
    return per_strip * num_strips


def _cpu_fill_seconds(n, m, local, rng, sm) -> float:
    """Wall seconds for one native-oracle fill (dirs included)."""
    from ..native import bindings

    text = _random_protein(rng, n)
    pattern = _random_protein(rng, m)

    def run():
        bindings.oracle_fill(1 if local else 0, text, pattern, sm, 23, 5)

    return wall_seconds(run, repeats=1)


def cmd_throughput(args) -> None:
    rng = np.random.default_rng(0)
    sm = _blosum50()
    local = args.local
    if args.sizes:
        sizes = [tuple(map(int, s.split("x"))) for s in args.sizes]
    elif local:
        # Reference grid: {256..16384} x 32768 local (benchmarks.cu:104-126).
        sizes = [(32768, 2 ** k) for k in range(8, 15)]
    else:
        sizes = [(2 ** k, 2 ** k) for k in range(8, 17)]

    # CPU column alongside the TPU one, like the reference's grid
    # (tests/benchmarks.cu:128-189 prints CPU and GPU side by side).
    cpu_cap = args.cpu_max
    print(f"Fill throughput ({'local' if local else 'global'}), "
          f"direction matrix included, best-like in-device timing")
    print(f"{'size':>16} {'tpu ms':>10} {'tpu MCUPS':>10} "
          f"{'cpu ms':>10} {'cpu MCUPS':>10}")
    for n, m in sizes:
        sec = _pair_fill_seconds(n, m, local, rng, sm)
        mcups = n * m / sec / 1e6
        if max(n, m) <= cpu_cap:
            cpu_sec = _cpu_fill_seconds(n, m, local, rng, sm)
            cpu_str = f"{cpu_sec * 1e3:>10.1f} {n * m / cpu_sec / 1e6:>10.0f}"
        else:
            cpu_str = f"{'-':>10} {'-':>10}"
        print(
            f"{n:>8}x{m:<7} {sec * 1e3:>10.1f} {mcups:>10.0f} {cpu_str}",
            flush=True,
        )


def cmd_latency(args) -> None:
    from ..constants import AlignmentType, Device
    from ..types import Request, Response
    from .. import api

    rng = np.random.default_rng(1)
    sm = _blosum50()
    # 65536^2 is the reference's headline latency size
    # (benchmark_latency_tesla.out: 3702 ms global on a V100).
    sizes = [(4096, 4096), (16384, 16384), (65536, 65536)]
    print("End-to-end latency (fill + transfer + traceback), best of 3")
    print(f"{'size':>16} {'algo':>8} {'tpu ms':>10} {'cpu ms':>12}")
    for n, m in sizes:
        for algo in (AlignmentType.GLOBAL, AlignmentType.LOCAL):
            request = Request()
            request.set_sequence_type(constants.SequenceType.PROTEIN)
            request.alignment_type = algo
            request.gap_penalty = 5
            request.text = _random_protein(rng, n).astype(np.int8)
            request.pattern = _random_protein(rng, m).astype(np.int8)
            request.score_matrix[:23, :23] = sm

            def run_tpu():
                response = Response()
                request.device_type = Device.TPU
                api.align(request, response)

            def run_cpu():
                response = Response()
                request.device_type = Device.CPU
                api.align(request, response)

            t_tpu = wall_seconds(run_tpu)
            t_cpu = wall_seconds(run_cpu, repeats=1) if n <= 16384 else float("nan")
            print(
                f"{n:>8}x{m:<7} {algo.value:>8} {t_tpu * 1e3:>10.0f} "
                f"{t_cpu * 1e3:>12.0f}",
                flush=True,
            )


def cmd_batch_e2e(args) -> None:
    """End-to-end batch alignment (fill + traceback + host assembly),
    the analog of the reference's batch benchmark — which could only
    loop full requests one at a time (tests/benchmarks.cu:271-332, 32x
    8192^2 global in 7205 ms on a GT 750M).  Here one dispatch fills the
    whole batch with direction words and a second walks every pair in
    lockstep."""
    from ..parallel.batch import BatchAligner

    rng = np.random.default_rng(5)
    k = 4 if args.dna else 23
    sm = (
        np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)
        if args.dna
        else _blosum50()
    )
    n = m = args.size
    batches = args.pairs if args.pairs else [1, 8, 32, 256, 1024]
    aligner = BatchAligner(sm, k, 5, local=args.local)
    print(
        f"End-to-end batch alignment, {n}x{m} "
        f"{'local' if args.local else 'global'} "
        f"{'DNA' if args.dna else 'protein'} pairs, wall time best of 2"
    )
    print(f"{'batch':>8} {'ms':>10} {'pairs/s':>10} {'GCUPS e2e':>10}")
    for b in batches:
        texts = [rng.integers(0, k, n).astype(np.int32) for _ in range(b)]
        patterns = [rng.integers(0, k, m).astype(np.int32) for _ in range(b)]
        box = {}

        def run():
            box["res"] = aligner.align(texts, patterns)

        sec = wall_seconds(run, repeats=2)
        assert len(box["res"]) == b
        print(
            f"{b:>8} {sec * 1e3:>10.0f} {b / sec:>10.0f} "
            f"{b * n * m / sec / 1e9:>10.2f}",
            flush=True,
        )


def cmd_batch(args) -> None:
    """Batch throughput grid.  Default: protein like the reference's
    fillDummyRequest batches; --dna --pairs 65536 runs the BASELINE
    64k-pair DNA workload on this chip."""
    from ..ops.pallas_fill import batch_score_pallas

    rng = np.random.default_rng(2)
    k = 4 if args.dna else 23
    sm = (
        np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)
        if args.dna
        else _blosum50()
    )
    n = m = args.size
    batches = args.pairs if args.pairs else [1024, 2048, 4096, 8192]
    mode = "semi" if args.semi else (
        "local" if args.dna else "global"
    )
    affine = (
        f", affine extend {args.affine_extend}"
        if args.affine_extend is not None else ""
    )
    print(
        f"Batch throughput, {n}x{m} "
        f"{mode} {'DNA' if args.dna else 'protein'} pairs (scores{affine})"
    )
    print(f"{'batch':>8} {'ms':>10} {'pairs/s':>12} {'GCUPS':>8}")
    for b in batches:
        texts = jnp.asarray(rng.integers(0, k, (b, n)), jnp.int32)
        patterns = jnp.asarray(rng.integers(0, k, (b, m)), jnp.int32)
        ns = jnp.full((b,), n, jnp.int32)
        ms = jnp.full((b,), m, jnp.int32)
        sm_j = jnp.asarray(sm)

        def call(perturb):
            return batch_score_pallas(
                texts, patterns, ns, ms, sm_j, 5 + perturb,
                k_alpha=k, local=args.dna and not args.semi,
                semi=args.semi,
                gap_extend=args.affine_extend,
            )

        # Small batches finish in <1 ms; more in-jit repeats keep the
        # differencing above the dispatch-latency noise floor.
        reps = max(3, min(16, (1 << 24) // max(1, b)))
        sec = device_seconds_per_call(call, reps=reps)
        print(
            f"{b:>8} {sec * 1e3:>10.1f} {b / sec:>12.0f} "
            f"{b * n * m / sec / 1e9:>8.1f}",
            flush=True,
        )


def cmd_maxlength(args) -> None:
    """Max-length probe (reference benchmarkMaxLength, benchmarks.cu:335-363).

    The reference's 500k x 500k demo runs under the BENCHMARK macro,
    which skips traceback (alignSequenceGPU.cu:555-626), so the fair
    comparison is a score-only local fill.  Engines: 'tiled' (strip
    kernel, also the traceback engine) or 'wavefront' (fastest fill).
    """
    from ..ops import tiled, wavefront

    rng = np.random.default_rng(3)
    sm = np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)
    for size in args.lengths:
        text = rng.integers(0, 4, size).astype(np.int32)
        pattern = rng.integers(0, 4, size).astype(np.int32)
        score_box = {}

        def run():
            if args.engine == "wavefront":
                score, bi, bj, _, _ = wavefront.wavefront_fill(
                    text, pattern, sm, 4, 5, local=True, with_dirs=False,
                    rps=4, slots=4096,
                )
            else:
                score = tiled.tiled_fill_score(
                    text, pattern, sm, 4, 5, local=True
                )
            score_box["score"] = score

        # Best-of-2: the first call pays per-process executable loading
        # through the remote compile helper.
        sec = wall_seconds(run, repeats=2)
        print(
            f"{size}x{size} ({args.engine}): {sec * 1e3:.0f} ms "
            f"({size * size / sec / 1e6:.0f} MCUPS), "
            f"score={score_box['score']}",
            flush=True,
        )


def cmd_engines(args) -> None:
    """Engine comparison on one fill — the analog of the reference's
    diagonal-vs-horizontal kernel benchmark (benchmarks.cu:56-100,
    tests/old_alignSequenceGPU.cu), here: lax.scan row engine vs the
    Pallas strip kernel vs the Pallas wavefront kernel."""
    import jax.numpy as jnp

    from ..ops import pallas_fill, scan_engine, wavefront

    rng = np.random.default_rng(4)
    n = m = args.size
    sm_np = np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)
    text = rng.integers(0, 4, n).astype(np.int32)
    pattern = rng.integers(0, 4, m).astype(np.int32)
    cells = n * m

    # XLA scan engine.
    width = scan_engine.padded_width(n)
    prof = scan_engine.build_profile(
        jnp.asarray(text), jnp.asarray(sm_np), width
    )
    pat = jnp.asarray(scan_engine.pad_pattern(pattern, scan_engine.padded_rows(m)))

    def xla_call(perturb):
        dirs, best, _ = scan_engine.sw_fill(
            prof, pat, 5 + perturb, n, m, with_dirs=True
        )
        return best + dirs[0, 0].astype(jnp.int32) * 0

    sec = device_seconds_per_call(xla_call, reps=3)
    print(f"xla scan engine:      {sec * 1e3:9.1f} ms  "
          f"{cells / sec / 1e6:9.0f} MCUPS", flush=True)

    # Pallas strip (prefix-max) kernel.
    prof2, p_cols = pallas_fill.build_pair_profile(
        jnp.asarray(text), jnp.asarray(sm_np), 4
    )
    m_pad = -(-m // 128) * 128
    pat2 = np.zeros(m_pad, np.int32)
    pat2[:m] = pattern
    pat2 = jnp.asarray(pat2)

    def strip_call(perturb):
        dirs, score, bi, bj = pallas_fill.pair_fill_pallas(
            prof2, pat2, 5 + perturb, n, m, local=True
        )
        return score + dirs[0, 0, 0] * 0

    sec = device_seconds_per_call(strip_call, reps=3)
    print(f"pallas strip kernel:  {sec * 1e3:9.1f} ms  "
          f"{cells / sec / 1e6:9.0f} MCUPS", flush=True)

    # Pallas wavefront kernel (per-strip sweep cost).
    steps_pad = -(-(n + wavefront.SLOTS - 1) // wavefront.STEPS) * wavefront.STEPS
    nb = steps_pad // wavefront.STEPS
    ts = jnp.asarray(
        np.pad(text, (0, steps_pad - n)).reshape(nb, wavefront.STEPS)
    )
    bot = jnp.zeros((nb, wavefront.STEPS), jnp.int32)
    rps0 = wavefront.ROWS_PER_SLOT
    pat_s = np.zeros(rps0 * wavefront.SLOTS, np.int32)
    pat_s[: min(m, rps0 * wavefront.SLOTS)] = np.asarray(pat2)[
        : min(m, rps0 * wavefront.SLOTS)
    ]
    pslots = jnp.asarray(
        np.ascontiguousarray(pat_s.reshape(wavefront.SLOTS, rps0).T)
        .reshape(rps0, 8, 128)
    )

    def wave_call(perturb):
        dirs, bo, rm, aj, sn, _ = wavefront.wavefront_strip(
            ts, bot, pslots, jnp.asarray(sm_np), 5 + perturb, n, m, 0,
            k_alpha=4, local=True, with_dirs=True,
        )
        return rm

    sec = device_seconds_per_call(wave_call, reps=3)
    strips = -(-m // (rps0 * wavefront.SLOTS))
    total = sec * strips
    print(f"pallas wavefront:     {total * 1e3:9.1f} ms  "
          f"{cells / total / 1e6:9.0f} MCUPS", flush=True)

    # Wide-slot wavefront (4096 slots x 4 rows per slot, dirs included).
    rps_w, slots_w = 4, 4096
    steps_w = -(-(n + slots_w - 1) // wavefront.STEPS) * wavefront.STEPS
    nbw = steps_w // wavefront.STEPS
    tsw = jnp.asarray(
        np.pad(text, (0, steps_w - n)).reshape(nbw, wavefront.STEPS)
    )
    botw = jnp.zeros((nbw, wavefront.STEPS), jnp.int32)
    patw = np.zeros(rps_w * slots_w, np.int32)
    patw[:m] = pattern[: rps_w * slots_w]
    pw = jnp.asarray(
        np.ascontiguousarray(patw.reshape(slots_w, rps_w).T)
        .reshape(rps_w, slots_w // 128, 128)
    )

    def wide_call(perturb):
        dirs, bo, rm, aj, sn, _ = wavefront.wavefront_strip(
            tsw, botw, pw, jnp.asarray(sm_np), 5 + perturb, n, m, 0,
            k_alpha=4, local=True, with_dirs=True, rps=rps_w, slots=slots_w,
        )
        return rm

    sec = device_seconds_per_call(wide_call, reps=3)
    strips = -(-m // (rps_w * slots_w))
    total = sec * strips
    print(f"wavefront 4096-slot:  {total * 1e3:9.1f} ms  "
          f"{cells / total / 1e6:9.0f} MCUPS", flush=True)

    # Deep-strip wavefront (65536-row strips, the round-2 default for
    # long patterns) — the full engine lineage in one table.
    rps_d, slots_d = 16, 4096
    patd = np.zeros(rps_d * slots_d, np.int32)
    patd[:m] = pattern[: rps_d * slots_d]
    pd = jnp.asarray(
        np.ascontiguousarray(patd.reshape(slots_d, rps_d).T)
        .reshape(rps_d, slots_d // 128, 128)
    )

    def deep_call(perturb):
        outs = wavefront.wavefront_strip(
            tsw, botw, pd, jnp.asarray(sm_np), 5 + perturb, n, m, 0,
            k_alpha=4, local=True, with_dirs=True, rps=rps_d,
            slots=slots_d,
        )
        return outs[2]

    sec = device_seconds_per_call(deep_call, reps=3)
    strips = -(-m // (rps_d * slots_d))
    total = sec * strips
    print(f"wavefront deep-strip: {total * 1e3:9.1f} ms  "
          f"{cells / total / 1e6:9.0f} MCUPS", flush=True)


def main(argv=None) -> int:
    # Multi-host pods: join the distributed runtime before any device
    # use (no-op single-host; see parallel/mesh.py).
    from ..parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()
    parser = argparse.ArgumentParser(prog="seqalign-bench")
    sub = parser.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("throughput")
    p.add_argument("--local", action="store_true")
    p.add_argument("--sizes", nargs="*", help="e.g. 4096x4096")
    p.add_argument(
        "--cpu-max", type=int, default=16384, dest="cpu_max",
        help="skip the CPU column above this size (oracle is ~0.4 GCUPS)",
    )
    p.set_defaults(fn=cmd_throughput)
    p = sub.add_parser("latency")
    p.set_defaults(fn=cmd_latency)
    p = sub.add_parser("batch")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--dna", action="store_true")
    p.add_argument("--pairs", nargs="*", type=int)
    p.add_argument("--semi", action="store_true")
    p.add_argument(
        "--affine-extend", type=int, default=None, dest="affine_extend"
    )
    p.set_defaults(fn=cmd_batch)
    p = sub.add_parser("batch-e2e")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--dna", action="store_true")
    p.add_argument("--local", action="store_true")
    p.add_argument("--pairs", nargs="*", type=int)
    p.set_defaults(fn=cmd_batch_e2e)
    p = sub.add_parser("maxlength")
    p.add_argument("--lengths", nargs="*", type=int, default=[120000])
    p.add_argument(
        "--engine", choices=("tiled", "wavefront"), default="wavefront"
    )
    p.set_defaults(fn=cmd_maxlength)
    p = sub.add_parser("engines")
    p.add_argument("--size", type=int, default=4096)
    p.set_defaults(fn=cmd_engines)
    args = parser.parse_args(argv)
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
