"""Checkpointed long-pair engine: boundary-checkpoint fill + path-only
traceback re-fill.

The reference's long-sequence traceback needs the FULL direction matrix
in pinned host RAM (alignSequenceGPU.cu:410-418, 588-648) — 250 GB at
its 500k x 500k demo scale, which is why that demo runs fill-only under
the BENCHMARK macro.  Here:

* Phase 1 runs the score-only wavefront kernel (the fastest fill) with
  two extra boundary outputs kept in HBM: each strip's bottom DP row
  (the existing inter-strip stream) and column checkpoints every
  ``ckpt_cols`` columns (captured in-kernel as each vector slot's sweep
  crosses a checkpoint column).  Total checkpoint memory is
  O(n*m / tile) — ~250 MB at 500k^2 — instead of O(n*m).
* Phase 2 re-fills direction words for just the O(n/ckpt_cols +
  m/strip_rows) tiles the optimal path crosses (strip kernel, seeded
  from the saved boundaries) and walks each tile on device, so only the
  O(n+m) move list ever crosses the host link.

Directions are recomputed bit-exactly by kernels already validated
against the oracle, so alignments stay byte-identical to the CPU
reference — a capability the reference never demonstrates at this
scale.  This is the rematerialization idea (trade re-compute for
memory) applied to DP traceback; it replaces both the reference's
pinned-host-matrix design and the O(2x-fill) Hirschberg alternative
(which could not honor the reference's exact tie policy without
carrying extra state).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..native import bindings
from . import pallas_fill, wavefront
from .pallas_fill import SUBLANES
from .tiled import _strip_profile
from .traceback import device_walk_window

_INT = jnp.int32
_LEFT, _DIAG, _TOP, _STOP = 0, 1, 2, 3

DEFAULT_CKPT_COLS = 32768  # column-checkpoint spacing (= re-fill tile width)
# Phase-1 wavefront geometry: 4096 vector slots x 4 rows per slot keeps
# the 16384-row strip height (strip_fill_pallas re-fills still fit) but
# shortens the sequential per-step row chain 4x by widening every vector
# op to 32 sublane-rows — the same latency amortization that took the
# batch kernel from 119 to ~300+ GCUPS.
DEFAULT_CKPT_RPS = 4
DEFAULT_CKPT_SLOTS = 4096


@dataclasses.dataclass
class CheckpointedFill:
    """Score + boundary checkpoints of a wavefront score-only fill.

    colvals[b]: (num_ckpts, rows) device — S[i, (q+1)*ckpt_cols] for the
      rows of wavefront strip b (row i = b*rows + ri + 1 at index ri).
    boundaries[b]: (steps_pad,) device — S[(b+1)*rows, j] at index j-1.
    """

    score: int
    best_i: int
    best_j: int
    colvals: list
    boundaries: list
    n: int
    m: int
    rows: int       # wavefront strip height = re-fill tile height
    rps: int
    ckpt_cols: int  # re-fill tile width
    gap: int
    local: bool
    semi: bool


def checkpointed_fill(text, pattern, score_matrix, k_alpha: int, gap: int,
                      local: bool = False, semi: bool = False,
                      ckpt_cols: int = DEFAULT_CKPT_COLS,
                      rps: int = DEFAULT_CKPT_RPS,
                      slots: int = DEFAULT_CKPT_SLOTS) -> CheckpointedFill:
    """Score-only wavefront fill keeping tile boundary checkpoints on
    device (the strip loop mirrors wavefront.wavefront_fill)."""
    text_np = np.asarray(text, dtype=np.int32)
    pattern_np = np.asarray(pattern, dtype=np.int32)
    sm = np.asarray(score_matrix, dtype=np.int32).reshape(-1)[
        : k_alpha * k_alpha
    ].reshape(k_alpha, k_alpha)
    # Validate the packed-substitution |score| <= 127 contract up front
    # (the strips below pack via the unvalidated traced packer).
    pallas_fill.pack_score_matrix(sm, k_alpha)
    n, m = text_np.shape[0], pattern_np.shape[0]
    gap = int(gap)
    interpret = config.pallas_interpret()
    rows = rps * slots

    num_strips = max(1, -(-m // rows))
    total_steps = n + slots - 1
    steps_pad = -(-total_steps // wavefront.STEPS) * wavefront.STEPS
    num_blocks = steps_pad // wavefront.STEPS

    text_steps = np.zeros(steps_pad, dtype=np.int32)
    text_steps[:n] = text_np
    ts_dev = jnp.asarray(text_steps.reshape(num_blocks, wavefront.STEPS))

    pat_pad = np.zeros(num_strips * rows, dtype=np.int32)
    pat_pad[:m] = pattern_np

    if local or semi:
        # Semi-global: H[0, j] = 0 like local; interior recurrence and
        # the H[i, 0] column stay NW-style.
        bottom = jnp.zeros((num_blocks, wavefront.STEPS), _INT)
    else:
        bottom = jnp.asarray(
            (-gap * (np.arange(steps_pad, dtype=np.int64) + 1))
            .astype(np.int32)
            .reshape(num_blocks, wavefront.STEPS)
        )

    colvals, boundaries, rowmaxs, argjs, snaps = [], [], [], [], []
    for b in range(num_strips):
        i0 = b * rows
        chunk = pat_pad[i0 : i0 + rows].reshape(slots, rps)
        pat_slots = jnp.asarray(
            np.ascontiguousarray(chunk.T).reshape(rps, slots // 128, 128)
        )
        _, bot_out, rowmax, argj, snap, ckpts = wavefront.wavefront_strip(
            ts_dev, bottom, pat_slots, sm, gap, n, m, i0,
            k_alpha=k_alpha, local=local, with_dirs=False, rps=rps,
            ckpt_every=ckpt_cols, slots=slots, semi=semi,
            interpret=interpret,
        )
        # (num_ckpts*rps, slots/128, 128) -> (num_ckpts, rows) with row
        # index ri = rps*slot + r.
        num_ckpts = ckpts.shape[0] // rps
        colvals.append(
            ckpts.reshape(num_ckpts, rps, slots)
            .transpose(0, 2, 1)
            .reshape(num_ckpts, rows)
        )
        # Keep device handles; one batched fetch after the strip loop
        # avoids a host sync (tunnel round trip) per strip.
        rowmaxs.append(rowmax)
        argjs.append(argj)
        snaps.append(snap)
        # Bottom boundary row: value S[i0+rows, j] at flat index j-1,
        # padded so phase-2 tile slices up to ceil(n/ckpt_cols)*ckpt_cols
        # stay in bounds (pad values feed only j > n cells, never read).
        flat = jnp.reshape(bot_out, (-1,))
        shifted = jnp.concatenate(
            [flat[slots - 1 :], jnp.zeros((slots - 1,), _INT)]
        )
        pad = -(-steps_pad // ckpt_cols) * ckpt_cols - steps_pad
        boundaries.append(
            jnp.concatenate([shifted, jnp.zeros((pad,), _INT)])
            if pad
            else shifted
        )
        if b + 1 < num_strips:
            bottom = shifted.reshape(num_blocks, wavefront.STEPS)

    rowmaxs, argjs, snaps = jax.device_get((rowmaxs, argjs, snaps))
    rowmaxs = [np.asarray(x).reshape(rps, -1) for x in rowmaxs]
    argjs = [np.asarray(x).reshape(rps, -1) for x in argjs]
    if local:
        score, bi, bj = wavefront.merge_local_best(
            rowmaxs, argjs, rows, rps, m, slots=slots
        )
    elif semi:
        # Row m's tracker: its first-occurrence last-row maximum.
        strip = (m - 1) // rows
        ri = (m - 1) % rows
        slot_idx, r_idx = ri // rps, ri % rps
        score = int(rowmaxs[strip][r_idx, slot_idx])
        bi, bj = m, int(argjs[strip][r_idx, slot_idx])
    else:
        strip = (m - 1) // rows
        slot_idx = ((m - 1) % rows) // rps
        score = int(np.asarray(snaps[strip]).reshape(-1)[slot_idx])
        bi, bj = m, n
    return CheckpointedFill(
        score=score, best_i=bi, best_j=bj,
        colvals=colvals, boundaries=boundaries,
        n=n, m=m, rows=rows, rps=rps, ckpt_cols=ckpt_cols,
        gap=gap, local=local, semi=semi,
    )


def _tile_inputs(ck: CheckpointedFill, sm, k_alpha: int, c: int, b: int,
                 cache: dict):
    """Boundary inputs of tile (column strip c, row block b): the strip
    profile, pattern chunk, left boundary column and top boundary row."""
    strip_off = c * ck.ckpt_cols
    row_base = b * ck.rows
    if ("prof", c) not in cache:
        cache[("prof", c)] = _strip_profile(
            cache["text"], sm, k_alpha, strip_off, ck.ckpt_cols, ck.n
        )
    l = ck.ckpt_cols // SUBLANES

    # Left boundary column S[row_base + r, strip_off], r = 0..rows.
    if c == 0:
        lc = jnp.asarray(
            pallas_fill.nw_boundary_col(row_base, ck.rows, ck.gap, ck.local)
        )
    else:
        body = ck.colvals[b][c - 1]
        if b == 0:
            corner_val = 0 if (ck.local or ck.semi) else -ck.gap * strip_off
            corner = jnp.full((1,), corner_val, _INT)
        else:
            corner = ck.boundaries[b - 1][strip_off - 1 : strip_off]
        lc = jnp.concatenate([corner, body])

    # Top boundary row S[row_base, strip_off+1 .. strip_off+ckpt_cols]
    # in the strip kernel's (8, L) segmented layout.
    if b == 0:
        prev_row = jnp.asarray(
            pallas_fill.init_prev_row(
                l, strip_off, ck.gap, ck.local or ck.semi
            )
        )
    else:
        prev_row = ck.boundaries[b - 1][
            strip_off : strip_off + ck.ckpt_cols
        ].reshape(SUBLANES, l)
    return (
        cache[("prof", c)],
        cache["pattern"][row_base : row_base + ck.rows],
        lc,
        prev_row,
    )


def _refill_tile(ck: CheckpointedFill, sm, k_alpha: int, c: int, b: int,
                 cache: dict):
    """Recompute tile (c, b)'s packed direction words from the saved
    boundaries (device array, tile-local layout)."""
    profile, pat_chunk, lc, prev_row = _tile_inputs(ck, sm, k_alpha, c, b,
                                                    cache)
    dirs, _, _, _ = pallas_fill.strip_fill_pallas(
        profile, pat_chunk,
        jnp.asarray(ck.gap, _INT), ck.n, ck.m,
        b * ck.rows, c * ck.ckpt_cols,
        lc, prev_row,
        jnp.asarray(pallas_fill._zeros_state(ck.local)),
        local=ck.local, with_dirs=True,
        interpret=config.pallas_interpret(),
    )
    return dirs.reshape(dirs.shape[0], ck.ckpt_cols)


@functools.partial(
    jax.jit, static_argnames=("local", "max_moves")
)
def _refill_walk(profile, pat_chunk, gap, n, m, row_base, strip_off,
                 lc, prev_row, state0, i, j, local: bool, max_moves: int):
    """One dispatch: re-fill a tile's direction words and walk them on
    device — only the move list comes back to the host."""
    dirs, _, _, _ = pallas_fill.strip_fill_pallas(
        profile, pat_chunk, gap, n, m, row_base, strip_off,
        lc, prev_row, state0, local=local, with_dirs=True,
    )
    words = dirs.reshape(dirs.shape[0], -1)
    return device_walk_window(
        words, row_base, strip_off, i, j, local, max_moves
    )


def checkpointed_traceback(ck: CheckpointedFill, text, pattern,
                           score_matrix, k_alpha: int):
    """Walk the optimal path by re-filling only the tiles it crosses.

    Returns (aligned_text_idx, aligned_pattern_idx, start_text,
    start_pattern) — byte-identical to the full-matrix walks.
    """
    text_np = np.asarray(text, dtype=np.int32)
    pattern_np = np.asarray(pattern, dtype=np.int32)
    sm = np.asarray(score_matrix, dtype=np.int32).reshape(-1)[
        : k_alpha * k_alpha
    ].reshape(k_alpha, k_alpha)
    m_pad = len(ck.colvals) * ck.rows
    pat_pad = np.zeros(m_pad, dtype=np.int32)
    pat_pad[: ck.m] = pattern_np
    cache = {"text": text_np, "pattern": jnp.asarray(pat_pad)}

    local = ck.local
    if local:
        i, j = ck.best_i, ck.best_j
        done = i == 0 or j == 0
    elif ck.semi:
        # Start at the best last-row cell; free text end-gaps are not
        # emitted, so the walk simply stops on reaching row 0.
        i, j = ck.m, ck.best_j
        done = i == 0
    else:
        i, j = ck.m, ck.n
        done = False
    max_moves = ck.rows + ck.ckpt_cols + 1
    use_device_walk = (
        config.use_pallas() and not config.pallas_interpret()
    )
    moves_parts = []
    start_i, start_j = i, j

    while not done:
        if not local and (i == 0 or j == 0):
            # Forced first-row/column moves (alignSequenceCPU.cpp:77-81;
            # j == 0 forces TOP before i == 0 forces LEFT).  Semi-global
            # stops at row 0 without emitting the free text end-gap.
            if j == 0 and i > 0:
                moves_parts.append(np.full(i, _TOP, np.uint8))
            elif i == 0 and j > 0 and not ck.semi:
                moves_parts.append(np.full(j, _LEFT, np.uint8))
            break
        c = (j - 1) // ck.ckpt_cols
        b = (i - 1) // ck.rows
        row_lo, col_lo = b * ck.rows, c * ck.ckpt_cols
        if use_device_walk:
            profile, pat_chunk, lc, prev_row = _tile_inputs(
                ck, sm, k_alpha, c, b, cache
            )
            out, k, i_d, j_d, done_d = _refill_walk(
                profile, pat_chunk, jnp.asarray(ck.gap, _INT), ck.n, ck.m,
                row_lo, col_lo, lc, prev_row,
                jnp.asarray(pallas_fill._zeros_state(local)),
                i, j, local, max_moves,
            )
            k = int(k)
            mv = np.asarray(jax.device_get(out))[:k].astype(np.uint8)
            i, j, tile_done = int(i_d), int(j_d), bool(done_d)
        else:
            words_np = np.asarray(
                jax.device_get(_refill_tile(ck, sm, k_alpha, c, b, cache))
            )
            mv, i, j, tile_done = bindings.walk_packed_window(
                words_np, row_lo, col_lo, i, j, local
            )
        moves_parts.append(mv)
        if local:
            done = tile_done
        elif ck.semi:
            done = i == 0
        else:
            done = i == 0 and j == 0

    moves = (
        np.concatenate(moves_parts)
        if moves_parts
        else np.zeros(0, np.uint8)
    )
    at, ap, st, sp = bindings.emit_moves(
        moves, start_i, start_j, local, text_np, pattern_np, k_alpha
    )
    if ck.semi:
        # Fit-alignment offsets: where the pattern lands in the text.
        st, sp = j, 0
    return at, ap, st, sp


def checkpointed_align(text, pattern, score_matrix, k_alpha: int, gap: int,
                       local: bool = False, semi: bool = False,
                       ckpt_cols: int = DEFAULT_CKPT_COLS,
                       rps: int = DEFAULT_CKPT_RPS,
                       slots: int = DEFAULT_CKPT_SLOTS):
    """Full alignment of an arbitrarily long pair in O(boundary) memory.

    Returns (score, best_i, best_j, aligned_text_idx, aligned_pattern_idx,
    start_text, start_pattern).
    """
    ck = checkpointed_fill(
        text, pattern, score_matrix, k_alpha, gap,
        local=local, semi=semi, ckpt_cols=ckpt_cols, rps=rps, slots=slots,
    )
    at, ap, st, sp = checkpointed_traceback(
        ck, text, pattern, score_matrix, k_alpha
    )
    return ck.score, ck.best_i, ck.best_j, at, ap, st, sp
