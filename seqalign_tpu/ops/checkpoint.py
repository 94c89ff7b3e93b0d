"""Checkpointed long-pair engine: boundary-checkpoint fill + path-only
traceback re-fill.

The reference's long-sequence traceback needs the FULL direction matrix
in pinned host RAM (alignSequenceGPU.cu:410-418, 588-648) — 250 GB at
its 500k x 500k demo scale, which is why that demo runs fill-only under
the BENCHMARK macro.  Here the fill keeps only each tile's boundary row
and boundary column in HBM (O((n*m)/tile_rows) — ~100 MB at 500k^2) and
the traceback re-fills direction words for just the O(n/strip_cols +
m/block_rows) tiles the optimal path crosses, walking each tile on
device so only the O(n+m) move list ever crosses the host link.
Directions are recomputed bit-exactly by the same strip kernel, so
alignments stay byte-identical to the CPU oracle — a capability the
reference never demonstrates at this scale.

This is the rematerialization idea (trade re-compute for memory) applied
to DP traceback; it replaces both the reference's pinned-host-matrix
design and the O(2x-fill) Hirschberg alternative (which could not honor
the reference's exact tie policy without carrying extra state).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..native import bindings
from . import pallas_fill
from .pallas_fill import ROWS_PER_STEP, SUBLANES
from .tiled import DEFAULT_STRIP_COLS, _strip_profile
from .traceback import device_walk_window

_INT = jnp.int32
_LEFT, _DIAG, _TOP, _STOP = 0, 1, 2, 3

# Row-block (= tile height) granularity of the checkpoints; also the
# per-call chunk size of the fill (SMEM-capped by MAX_CHUNK_ROWS).
DEFAULT_CKPT_ROWS = pallas_fill.MAX_CHUNK_ROWS


@dataclasses.dataclass
class CheckpointedFill:
    """Score + boundary checkpoints of a tiled score-only fill.

    left_cols[c]: (m_pad+1,) device — S[i, c*strip_cols] for i=0..m_pad.
    top_rows[c][b]: (8, L) device — DP row b*block_rows of strip c.
    """

    score: int
    best_i: int
    best_j: int
    left_cols: list
    top_rows: list
    n: int
    m: int
    m_pad: int
    strip_cols: int
    block_rows: int
    gap: int
    local: bool


def checkpointed_fill(text, pattern, score_matrix, k_alpha: int, gap: int,
                      local: bool = False,
                      strip_cols: int = DEFAULT_STRIP_COLS,
                      block_rows: int = DEFAULT_CKPT_ROWS) -> CheckpointedFill:
    """Score-only strip fill that keeps tile boundary checkpoints on
    device (the fill loop mirrors tiled.tiled_fill, minus the direction
    stream)."""
    text_np = np.asarray(text, dtype=np.int32)
    pattern_np = np.asarray(pattern, dtype=np.int32)
    sm = np.asarray(score_matrix, dtype=np.int32).reshape(-1)[
        : k_alpha * k_alpha
    ].reshape(k_alpha, k_alpha)
    n, m = text_np.shape[0], pattern_np.shape[0]
    gap = int(gap)
    interpret = config.pallas_interpret()

    m_pad = max(ROWS_PER_STEP, -(-m // ROWS_PER_STEP) * ROWS_PER_STEP)
    block_rows = min(
        m_pad,
        pallas_fill.MAX_CHUNK_ROWS,
        max(ROWS_PER_STEP, (block_rows // ROWS_PER_STEP) * ROWS_PER_STEP),
    )
    num_strips = max(1, -(-n // strip_cols))
    l = strip_cols // SUBLANES

    pat_pad = np.zeros(m_pad, dtype=np.int32)
    pat_pad[:m] = pattern_np
    pat_dev = jnp.asarray(pat_pad)

    left_col = jnp.asarray(pallas_fill.nw_boundary_col(0, m_pad, gap, local))
    left_cols, top_rows, strip_states = [], [], []

    for c in range(num_strips):
        strip_off = c * strip_cols
        profile = _strip_profile(text_np, sm, k_alpha, strip_off,
                                 strip_cols, n)
        prev_row = jnp.asarray(
            pallas_fill.init_prev_row(l, strip_off, gap, local)
        )
        state = jnp.asarray(pallas_fill._zeros_state(local))
        top_val = 0 if local else -gap * (strip_off + strip_cols)
        rcol_parts = [jnp.full((1,), top_val, _INT)]
        left_cols.append(left_col)
        strip_tops = []

        for row_base in range(0, m_pad, block_rows):
            rows_here = min(block_rows, m_pad - row_base)
            strip_tops.append(prev_row)
            _, prev_row, rcol, state = pallas_fill.strip_fill_pallas(
                profile,
                pat_dev[row_base : row_base + rows_here],
                gap, n, m, row_base, strip_off,
                left_col[row_base : row_base + rows_here + 1],
                prev_row, state,
                local=local, with_dirs=False, interpret=interpret,
            )
            rcol_parts.append(rcol)

        top_rows.append(strip_tops)
        strip_states.append(np.asarray(jax.device_get(state))[0])
        if c + 1 < num_strips:
            left_col = jnp.concatenate(rcol_parts)

    # Merge per-strip states (same rules as tiled.tiled_fill).
    if local:
        best, bi, bj = 0, 0, 0
        for s_best, s_bi, s_bj, _ in strip_states:
            s_best, s_bi, s_bj = int(s_best), int(s_bi), int(s_bj)
            if s_best > best or (s_best == best and s_best > 0
                                 and (s_bi, s_bj) < (bi, bj)):
                best, bi, bj = s_best, s_bi, s_bj
        score = best
    else:
        score = max(int(s[3]) for s in strip_states)
        bi, bj = m, n
    return CheckpointedFill(
        score=score, best_i=bi, best_j=bj,
        left_cols=left_cols, top_rows=top_rows,
        n=n, m=m, m_pad=m_pad, strip_cols=strip_cols,
        block_rows=block_rows, gap=gap, local=local,
    )


def _refill_tile(ck: CheckpointedFill, text_np, sm, k_alpha: int,
                 c: int, b: int, profile_cache: dict):
    """Recompute one tile's packed direction words (device array)."""
    strip_off = c * ck.strip_cols
    row_base = b * ck.block_rows
    rows_here = min(ck.block_rows, ck.m_pad - row_base)
    if c not in profile_cache:
        profile_cache[c] = _strip_profile(
            text_np, sm, k_alpha, strip_off, ck.strip_cols, ck.n
        )
    dirs, _, _, _ = pallas_fill.strip_fill_pallas(
        profile_cache[c],
        profile_cache["pattern"][row_base : row_base + rows_here],
        ck.gap, ck.n, ck.m, row_base, strip_off,
        ck.left_cols[c][row_base : row_base + rows_here + 1],
        ck.top_rows[c][b],
        jnp.asarray(pallas_fill._zeros_state(ck.local)),
        local=ck.local, with_dirs=True,
        interpret=config.pallas_interpret(),
    )
    return dirs.reshape(dirs.shape[0], ck.strip_cols)


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
    pat_pad = np.zeros(ck.m_pad, dtype=np.int32)
    pat_pad[: ck.m] = pattern_np
    profile_cache = {"pattern": jnp.asarray(pat_pad)}

    local = ck.local
    if local:
        i, j = ck.best_i, ck.best_j
        done = i == 0 or j == 0
    else:
        i, j = ck.m, ck.n
        done = False
    max_moves = ck.block_rows + ck.strip_cols + 1
    use_device_walk = (
        config.use_pallas() and not config.pallas_interpret()
    )
    moves_parts = []
    start_i, start_j = i, j

    while not done:
        if not local and (i == 0 or j == 0):
            # Forced first-row/column moves (alignSequenceCPU.cpp:77-81;
            # j == 0 forces TOP before i == 0 forces LEFT).
            if j == 0 and i > 0:
                moves_parts.append(np.full(i, _TOP, np.uint8))
            elif i == 0 and j > 0:
                moves_parts.append(np.full(j, _LEFT, np.uint8))
            break
        c = (j - 1) // ck.strip_cols
        b = (i - 1) // ck.block_rows
        words = _refill_tile(ck, text_np, sm, k_alpha, c, b, profile_cache)
        row_lo, col_lo = b * ck.block_rows, c * ck.strip_cols
        if use_device_walk:
            out, k, i_d, j_d, done_d = device_walk_window(
                words, row_lo, col_lo, i, j, local, max_moves
            )
            k = int(k)
            mv = np.asarray(jax.device_get(out))[:k].astype(np.uint8)
            i, j, tile_done = int(i_d), int(j_d), bool(done_d)
        else:
            words_np = np.asarray(jax.device_get(words))
            mv, i, j, tile_done = bindings.walk_packed_window(
                words_np, row_lo, col_lo, i, j, local
            )
        moves_parts.append(mv)
        if local:
            done = tile_done
        else:
            done = i == 0 and j == 0

    moves = (
        np.concatenate(moves_parts)
        if moves_parts
        else np.zeros(0, np.uint8)
    )
    return bindings.emit_moves(
        moves, start_i, start_j, local, text_np, pattern_np, k_alpha
    )


def checkpointed_align(text, pattern, score_matrix, k_alpha: int, gap: int,
                       local: bool = False,
                       strip_cols: int = DEFAULT_STRIP_COLS,
                       block_rows: int = DEFAULT_CKPT_ROWS):
    """Full alignment of an arbitrarily long pair in O(boundary) memory.

    Returns (score, best_i, best_j, aligned_text_idx, aligned_pattern_idx,
    start_text, start_pattern).
    """
    ck = checkpointed_fill(
        text, pattern, score_matrix, k_alpha, gap,
        local=local, strip_cols=strip_cols, block_rows=block_rows,
    )
    at, ap, st, sp = checkpointed_traceback(
        ck, text, pattern, score_matrix, k_alpha
    )
    return ck.score, ck.best_i, ck.best_j, at, ap, st, sp
