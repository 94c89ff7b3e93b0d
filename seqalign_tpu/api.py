"""Top-level alignment API: request -> engine dispatch -> response.

Equivalent of the reference's engine entry points
(reference: alignSequenceCPU.cpp:287-333, alignSequenceGPU.cu:463-653):
``Device.CPU`` runs the native C++ oracle; ``Device.TPU`` runs the
JAX/XLA row-scan fill on the accelerator followed by the native host
traceback (the reference likewise tracebacks on host).  Both paths
produce byte-identical alignments.
"""

from __future__ import annotations

import sys
from typing import TextIO

import numpy as np

from . import constants
from .constants import AlignmentType, Device
from .types import Request, Response


def _indices_to_letters(indices: np.ndarray, alphabet: tuple[str, ...]) -> str:
    table = np.frombuffer(
        "".join(alphabet).encode("latin-1"), dtype=np.uint8
    )
    return table[indices].tobytes().decode("latin-1")


def _algo_code(alignment_type: AlignmentType) -> int:
    if alignment_type is AlignmentType.GLOBAL:
        return 0
    if alignment_type is AlignmentType.SEMI_GLOBAL:
        return 2
    return 1


def align_cpu(request: Request, response: Response,
              err: TextIO = sys.stderr) -> int:
    """Native oracle engine (reference CPU-path equivalent; affine gap
    costs when request.gap_extend is set — extension, CPU only)."""
    from .native import bindings

    algo = _algo_code(request.alignment_type)
    try:
        if request.gap_extend is not None:
            text_idx, pat_idx, start_t, start_p, score = (
                bindings.oracle_align_affine(
                    algo,
                    request.text,
                    request.pattern,
                    request.score_matrix,
                    request.alphabet_size,
                    request.gap_penalty,
                    request.gap_extend,
                )
            )
        else:
            text_idx, pat_idx, start_t, start_p, score = (
                bindings.oracle_align(
                    algo,
                    request.text,
                    request.pattern,
                    request.score_matrix,
                    request.alphabet_size,
                    request.gap_penalty,
                )
            )
    except MemoryError:
        err.write(constants.MEM_ERROR)
        return 1
    response.aligned_text = _indices_to_letters(text_idx, request.alphabet)
    response.aligned_pattern = _indices_to_letters(pat_idx, request.alphabet)
    response.start_in_aligned_text = start_t
    response.start_in_aligned_pattern = start_p
    response.score = score
    return 0


def align_tpu(request: Request, response: Response,
              err: TextIO = sys.stderr) -> int:
    """Accelerator engine: device fill + device/host traceback.

    Affine (Gotoh) requests (--gap-extend, an extension) route through
    the direct / checkpointed wavefront engines, byte-identical to the
    native sa_align_affine oracle — all three modes, semi-global
    ("fit") included (algo=2 in the oracle).
    """
    from . import config
    from .models import aligner_for

    config.enable_compile_cache()
    try:
        model = aligner_for(request.alignment_type)
        result = model.align(
            request.text,
            request.pattern,
            request.score_matrix,
            request.alphabet_size,
            request.gap_penalty,
            gap_extend=request.gap_extend,
        )
    except MemoryError:
        err.write(constants.MEM_ERROR)
        return 1
    except ValueError as e:
        # e.g. the TPU engines' |score| <= 127 packed-substitution guard.
        err.write(f"error: {e}\n")
        return 1
    except RuntimeError as e:
        # A device-side allocation failure surfaces as an XLA
        # RESOURCE_EXHAUSTED JaxRuntimeError; map it to the reference's
        # MEM_ERROR (the GPU path prints it on cudaMalloc failure,
        # alignSequenceGPU.cu:502-546).  An unusable accelerator
        # backend gets the same mapping: on a no-GPU host the
        # reference's cudaMallocs fail and it prints MEM_ERROR too
        # (alignSequenceGPU.cu:541-546) — a clean exit 1, not a crash.
        msg = str(e)
        if (
            "RESOURCE_EXHAUSTED" in msg
            or "out of memory" in msg.lower()
            or "Unable to initialize backend" in msg
            or "UNAVAILABLE" in msg
        ):
            err.write(constants.MEM_ERROR)
            return 1
        raise
    response.aligned_text = _indices_to_letters(
        result.aligned_text, request.alphabet
    )
    response.aligned_pattern = _indices_to_letters(
        result.aligned_pattern, request.alphabet
    )
    response.start_in_aligned_text = result.start_in_aligned_text
    response.start_in_aligned_pattern = result.start_in_aligned_pattern
    response.score = result.score
    return 0


def align(request: Request, response: Response,
          err: TextIO = sys.stderr) -> int:
    """Runtime dispatch on the request's device (mainDriver.cu:18-21)."""
    if request.device_type is Device.CPU:
        return align_cpu(request, response, err=err)
    return align_tpu(request, response, err=err)
