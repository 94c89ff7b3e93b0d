"""Single-dispatch direct alignment for pairs that fit one wavefront strip.

Small and medium pairs were dominated by host round trips (~24 ms each
through tunneled transports; even a 4096^2 alignment paid ~8 of them
across fill, boundary handling and traceback).  Here ONE device dispatch
runs the whole alignment: the wavefront kernel fills the strip with
direction words in HBM, the best cell is merged on device (row-major
first-occurrence semantics, alignSequenceCPU.cpp:191-192), and the
in-kernel Pallas walker chases the path — only the score, best cell and
2-bit-packed move list return to the host, which replays them through
the native emitter.  Applies whenever the pattern fits one strip and the
move list fits the walker's SMEM output; longer pairs use the
checkpointed engine (ops/checkpoint.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..native import bindings
from . import wavefront
from .checkpoint import _pick_geometry
from .pallas_walk import pallas_walk_skewed_window, unpack_moves
from .traceback import emit_moves_affine

_INT = jnp.int32
_LEFT, _TOP = 0, 2

# Cap for the walker's packed-move output, now VMEM rows (round 2's
# SMEM output capped this at ~131k moves; the VMEM cost here is
# moves/4 bytes = 1 MiB at the cap).
MAX_DIRECT_MOVES = 4 << 20
# HBM budget for the strip's direction words: pattern 65536 x text 500k
# needs ~8.3 GB of one v5e's 16 GB; override on smaller-HBM chips.
MAX_DIRECT_DIRS_BYTES = int(
    os.environ.get("SEQALIGN_MAX_DIRECT_DIRS_BYTES", 10 << 30)
)


def _direct_geometry(m: int):
    """Shallowest strip the pattern fits (unlike the checkpoint picker,
    which optimizes long-pattern fill throughput, this one must FIT)."""
    rps, slots = _pick_geometry(m, None, None)
    while m > rps * slots and rps < 16:
        rps *= 2
    return rps, slots


def fits_direct(n: int, m: int, affine: bool = False) -> bool:
    rps, slots = _direct_geometry(m)
    if m > rps * slots:
        return False
    if n + m + 1 > MAX_DIRECT_MOVES:
        return False
    steps_pad = -(-(n + slots - 1) // wavefront.STEPS) * wavefront.STEPS
    dirs_bytes = (steps_pad // 16) * rps * slots * 4
    if affine:
        dirs_bytes *= 2
    return dirs_bytes <= MAX_DIRECT_DIRS_BYTES


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_alpha", "local", "semi", "affine", "rps", "slots",
        "max_moves", "interpret",
    ),
)
def _direct_fill_walk(text_steps, pat_slots, sm, gap, ext, n, m,
                      k_alpha: int, local: bool, semi: bool, affine: bool,
                      rps: int, slots: int, max_moves: int,
                      interpret: bool = False):
    num_blocks = text_steps.shape[0]
    steps_pad = num_blocks * wavefront.STEPS
    gap = jnp.asarray(gap, _INT)
    ext = jnp.asarray(ext, _INT)
    n = jnp.asarray(n, _INT)
    m = jnp.asarray(m, _INT)
    tvec = jnp.arange(steps_pad, dtype=_INT)
    if local or semi:
        bottom = jnp.zeros((steps_pad,), _INT)
    elif affine:
        bottom = -(gap + ext * tvec)
    else:
        bottom = -(gap * (tvec + 1))
    bottom = bottom.reshape(num_blocks, wavefront.STEPS)
    fbot = (
        jnp.full(
            (num_blocks, wavefront.STEPS), wavefront.NEG_HALF, _INT
        )
        if affine
        else None
    )
    outs = wavefront.wavefront_strip(
        text_steps, bottom, pat_slots, sm, gap, n, m, 0,
        k_alpha=k_alpha, local=local, with_dirs=True, rps=rps,
        slots=slots, semi=semi, affine=affine, ext=ext, fbot_in=fbot,
        interpret=interpret,
    )
    dirs, _, rowmax, argj, snap = outs[:5]
    dirs2 = outs[6] if affine else None

    srows = slots // 128
    slot = (
        jax.lax.broadcasted_iota(_INT, (rps, srows, 128), 1) * 128
        + jax.lax.broadcasted_iota(_INT, (rps, srows, 128), 2)
    )
    r_idx = jax.lax.broadcasted_iota(_INT, (rps, srows, 128), 0)
    i_all = rps * slot + r_idx + 1
    if local:
        # Row-major first occurrence: max value, then smallest row; the
        # per-row tracker already keeps the first column.
        best = jnp.max(rowmax)
        ties = rowmax == best
        win_i = jnp.min(jnp.where(ties, i_all, jnp.asarray(1 << 30, _INT)))
        win = jnp.logical_and(ties, i_all == win_i)
        bj = jnp.max(jnp.where(win, argj, 0))
        matched = best > 0
        score = jnp.maximum(best, 0)
        bi = jnp.where(matched, win_i, 0)
        bj = jnp.where(matched, bj, 0)
    elif semi:
        mask = i_all == m
        score = jnp.max(jnp.where(mask, rowmax, wavefront.NEG_INF))
        bi = m
        bj = jnp.max(jnp.where(mask, argj, 0))
    else:
        score = jnp.max(snap)
        bi, bj = m, n

    mv, k, i, j, st, done = pallas_walk_skewed_window(
        dirs, dirs2, rps, 0, 0, bi, bj, 0, local, affine, max_moves,
        interpret=interpret,
    )
    return score, bi, bj, mv, k, i, j


def direct_align(text, pattern, score_matrix, k_alpha: int, gap: int,
                 local: bool = False, semi: bool = False,
                 gap_extend: int | None = None,
                 rps: int | None = None, slots: int | None = None):
    """Full alignment in one device dispatch (see module docstring).

    Returns (score, best_i, best_j, aligned_text_idx,
    aligned_pattern_idx, start_text, start_pattern) — byte-identical to
    the oracle / checkpointed engine.
    """
    from . import pallas_fill

    text_np = np.asarray(text, dtype=np.int32)
    pattern_np = np.asarray(pattern, dtype=np.int32)
    sm = np.asarray(score_matrix, dtype=np.int32).reshape(-1)[
        : k_alpha * k_alpha
    ].reshape(k_alpha, k_alpha)
    pallas_fill.pack_score_matrix(sm, k_alpha)  # |score| <= 127 contract
    n, m = text_np.shape[0], pattern_np.shape[0]
    affine = gap_extend is not None
    if rps is None and slots is None:
        rps, slots = _direct_geometry(m)
    else:
        rps, slots = _pick_geometry(m, rps, slots)
    assert m <= rps * slots, "pattern exceeds one strip (use checkpoint)"
    interpret = config.pallas_interpret()

    steps_pad = -(-(n + slots - 1) // wavefront.STEPS) * wavefront.STEPS
    num_blocks = steps_pad // wavefront.STEPS
    text_steps = np.zeros(steps_pad, dtype=np.int32)
    text_steps[:n] = text_np
    pat_pad = np.zeros(rps * slots, dtype=np.int32)
    pat_pad[:m] = pattern_np
    pat_slots = np.ascontiguousarray(
        pat_pad.reshape(slots, rps).T
    ).reshape(rps, slots // 128, 128)
    max_moves = -(-(n + m + 1) // 16) * 16

    score, bi, bj, mv, k, i, j = _direct_fill_walk(
        jnp.asarray(text_steps.reshape(num_blocks, wavefront.STEPS)),
        jnp.asarray(pat_slots), jnp.asarray(sm),
        gap, gap_extend if affine else 0, n, m,
        k_alpha=k_alpha, local=local, semi=semi, affine=affine,
        rps=rps, slots=slots, max_moves=max_moves, interpret=interpret,
    )
    score, bi, bj, mv, k, i, j = jax.device_get(
        (score, bi, bj, mv, k, i, j)
    )
    score, bi, bj, k, i, j = (
        int(score), int(bi), int(bj), int(k), int(i), int(j),
    )
    moves = unpack_moves(np.asarray(mv), k)
    if not local and (i == 0 or j == 0) and not (i == 0 and j == 0):
        # Forced first-row/column moves (alignSequenceCPU.cpp:77-81);
        # semi-global stops at row 0 without the free text end-gap.
        if j == 0 and i > 0:
            moves = np.concatenate([moves, np.full(i, _TOP, np.uint8)])
        elif i == 0 and j > 0 and not semi:
            moves = np.concatenate([moves, np.full(j, _LEFT, np.uint8)])
    start_i = bi if (local or semi) else m
    start_j = bj if (local or semi) else n
    if affine:
        at, ap, st, sp = emit_moves_affine(
            moves, start_i, start_j, text_np, pattern_np, k_alpha
        )
    else:
        at, ap, st, sp = bindings.emit_moves(
            moves, start_i, start_j, local, text_np, pattern_np, k_alpha
        )
    if semi:
        st, sp = (j if j > 0 else 0), 0
    return score, bi, bj, at, ap, st, sp
