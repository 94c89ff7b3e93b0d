"""Runtime engine configuration.

One typed knob set replacing the reference's compile-time macros
(BENCHMARK / MAX_THREADS_PER_BLOCK / MAX_CONCURRENT_KERNELS,
alignSequenceGPU.cu:6-10).

Engine selection for the accelerator path:
  * "pallas" — the Pallas TPU kernels (ops/pallas_fill.py); default on a
    TPU backend.
  * "xla"    — the portable lax.scan engine (ops/scan_engine.py);
    default on CPU backends (used by the test suite).
Override with SEQALIGN_ENGINE=pallas|xla|pallas_interpret (the latter
runs the Pallas kernels in interpreter mode — exact but slow; useful for
kernel tests without TPU hardware).
"""

from __future__ import annotations

import os


def engine() -> str:
    forced = os.environ.get("SEQALIGN_ENGINE", "").lower()
    if forced in ("pallas", "xla", "pallas_interpret"):
        return forced
    import jax

    return "pallas" if jax.default_backend() != "cpu" else "xla"


def use_pallas() -> bool:
    return engine().startswith("pallas")


def pallas_interpret() -> bool:
    return engine() == "pallas_interpret"


def traceback_mode() -> str:
    """"host" (native C++ walk over streamed words, default) or "device"
    (lax.while_loop walk on the accelerator; only the aligned strings
    leave the device).  SEQALIGN_TRACEBACK overrides.  Device mode pairs
    with the strip engine's packed word format."""
    forced = os.environ.get("SEQALIGN_TRACEBACK", "").lower()
    return forced if forced in ("host", "device") else "host"


def pair_engine() -> str:
    """Single-pair fill kernel: "wavefront" (default, fastest), "strip"
    (prefix-max kernel) or "checkpoint" (boundary-checkpoint fill +
    path-only traceback re-fill — O(boundary) memory; the wavefront path
    falls back to it automatically when the streamed direction words
    would exceed MAX_HOST_DIRS_BYTES).  SEQALIGN_PAIR_ENGINE overrides."""
    forced = os.environ.get("SEQALIGN_PAIR_ENGINE", "").lower()
    if forced in ("wavefront", "strip", "checkpoint"):
        return forced
    return "wavefront"


def available_host_bytes() -> int | None:
    """Measured available host RAM (None if unknown) — used to cap the
    streamed-direction-words budgets, the analog of the reference's
    free-VRAM query in initMemory (alignSequenceGPU.cu:372-393)."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    return None


def host_dirs_budget() -> int:
    """Effective budget for direction words streamed to host RAM: the
    configured MAX_HOST_DIRS_BYTES, capped at half the measured
    available memory so an oversized override degrades to the
    checkpointed engine instead of an allocation failure."""
    budget = MAX_HOST_DIRS_BYTES
    avail = available_host_bytes()
    if avail is not None:
        budget = min(budget, avail // 2)
    return budget


def sequence_parallel() -> bool:
    """Route long single pairs across a multi-device mesh
    (parallel/sequence.py) when more than one device is visible.
    SEQALIGN_SEQUENCE_PARALLEL=1/0 forces; default: on with >1 device.
    On hosts with a slow device link the checkpointed engine (which
    never streams the direction matrix) often wins — set =0 there."""
    forced = os.environ.get("SEQALIGN_SEQUENCE_PARALLEL", "")
    if forced in ("0", "1"):
        return forced == "1"
    import jax

    return jax.device_count() > 1


_compile_cache_enabled = False


def enable_compile_cache() -> None:
    """Point JAX at the shared on-disk compilation cache so repeat runs
    skip the per-shape AOT kernel compile (~3-6 min per Mosaic shape on
    hosts with a remote compile helper).  The reference compiles its
    kernels once at build time (Makefile nvcc); the analog here is one
    persistent cache shared by every process — CLI, batch API, bench.
    SEQALIGN_COMPILE_CACHE overrides the directory; "0" disables."""
    global _compile_cache_enabled
    if _compile_cache_enabled:
        return
    _compile_cache_enabled = True
    path = os.environ.get("SEQALIGN_COMPILE_CACHE", "/tmp/jax_comp_cache")
    if path in ("", "0"):
        return
    import jax

    try:
        if jax.default_backend() == "cpu":
            # The cache exists to skip the remote Mosaic AOT compile;
            # XLA:CPU compiles are local and fast, and CPU executables
            # are AOT-serialized against the compiling host's exact CPU
            # features — loading (or even writing) entries produced on
            # a different host generation can SIGILL/segfault (seen:
            # pytest crash in compilation_cache.put_executable_and_time
            # after api.align enabled the cache under the CPU pin).
            return
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:  # cache is an optimization, never a failure
        pass


def int16_cells() -> str:
    """int16 cell mode of the batched fills (ops/pallas_fill.py, two DP
    cells per 32-bit VPU lane): "auto" routes eligible buckets
    (int16_cells_ok over the padded shapes) to the int16 kernel, "0"
    never, "1" asserts eligibility.  Default off until the mode is
    validated on the real chip (the Mosaic backend has rejected other
    legal kernel variants; see BENCH_NOTES on rps=32):
    scripts/probe_int16.py writes bench/results/INT16_VALIDATED after
    real-chip parity (score + dirs kernels) and a measured speedup,
    which flips the default to "auto".  SEQALIGN_INT16_CELLS overrides."""
    forced = os.environ.get("SEQALIGN_INT16_CELLS", "").lower()
    if forced in ("0", "1", "auto"):
        return forced
    marker = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench", "results", "INT16_VALIDATED",
    )
    return "auto" if os.path.exists(marker) else "0"


def dna_colprof() -> bool:
    """Small-alphabet (k <= 4) batch kernels read packed per-position
    substitution columns (ops/pallas_fill.pack_text_colprof) instead of
    letters: the per-cell lookup drops from a (k-1)-deep select chain to
    shift+mask+debias, ~3 fewer ALU ops on the VPU-issue-bound fill.
    SEQALIGN_DNA_COLPROF=0 restores the select-chain kernels (the value
    is read at trace time, so set it before the first batch call)."""
    return os.environ.get("SEQALIGN_DNA_COLPROF", "1") != "0"


def batch_walker_max_pairs() -> int:
    """Per-device pair-count ceiling for routing a batch traceback slice
    to the per-pair in-kernel Pallas walker (ops/batch_traceback.py)
    instead of the lockstep XLA gather walk.  The scalar walker costs
    ~0.2 us per MOVE serialized over pairs while the lockstep walk costs
    ~26 us per lockstep STEP regardless of batch size, so small batches
    of big pairs favor the walker and big batches the lockstep walk
    (crossover ~128-256 pairs).  SEQALIGN_BATCH_WALKER_MAX_PAIRS=0
    disables the walker.

    Default on a REAL TPU backend: 0 (lockstep only).  Fused into the
    same compiled program as the batch fill, the walker kernel kills
    the TPU worker for some ragged length mixes — deterministic, data-
    dependent, and fused-only: the identical shapes/data pass when the
    stages run as separate dispatches (scripts/bisect_walker_crash.py)
    and the full mode matrix is byte-identical via the lockstep walk
    (bench/results/r5_batch_align_chip_parity.out).  Interpret mode
    (tests) keeps the 256 default — the semantics are exact there and
    parity stays pinned; set the env to re-enable on hardware once the
    Mosaic interaction is fixed."""
    env = os.environ.get("SEQALIGN_BATCH_WALKER_MAX_PAIRS")
    if env is not None:
        return int(env)
    if engine() == "pallas":  # real Mosaic backend
        return 0
    return 256


def batch_pipeline_pairs() -> int:
    """Target pairs per fill+walk dispatch of ``BatchAligner.align``.
    Splitting a bucket into chunks of this size and collecting results
    one dispatch behind lets the host's uploads, downloads and native
    emit overlap the device fill of later chunks (a software pipeline;
    only the small packed move lists queue on device, so depth is
    unbounded).  0 = one dispatch per HBM budget (no voluntary
    chunking).  SEQALIGN_BATCH_PIPELINE_PAIRS overrides.  Measured on
    the 64k-pair 256^2 north-star workload (one v5e, warm, best of 2):
    no chunking 44.9k pairs/s, 8192 58.1k, 16384 66.4k (default),
    32768 62.0k (r5_pipeline_ab.out); with the threaded collect +
    async D2H prefetch the same sweep (best of 4) holds the ordering:
    16384 105.8k, 8192 96.0k, 32768 93.9k (r5_thread_ab.out)."""
    return int(os.environ.get("SEQALIGN_BATCH_PIPELINE_PAIRS", "16384"))


# Direction-matrix HBM budget for the single-call fill path; longer pairs
# go through the tiled streaming engine (ops/tiled.py).
MAX_DIRS_BYTES = int(
    os.environ.get("SEQALIGN_MAX_DIRS_BYTES", 4 * 1024**3)
)

# Budget for direction words streamed to host RAM by the wavefront/tiled
# single-pair engines; pairs whose words exceed it switch to the
# checkpointed engine (ops/checkpoint.py), which re-fills tiles along the
# optimal path instead of streaming the matrix.  Measured end-to-end
# (BENCH_NOTES.md): streaming 16384^2 words (70 MB) costs 5.5 s through
# this host link vs 0.52 s checkpointed, so the default keeps only
# small matrices on the streaming path; raise it on hosts with fast
# device links.
MAX_HOST_DIRS_BYTES = int(
    os.environ.get("SEQALIGN_MAX_HOST_DIRS_BYTES", 8 * 1024**2)
)
