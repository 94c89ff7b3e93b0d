"""Tiled long-sequence engine: column strips x streamed row blocks.

The TPU-native replacement for the reference's long-sequence machinery —
its <=1024-row kernel chunks pipelined through the device-global
columnState spin-lock protocol with the full direction matrix streamed
to pinned host memory (alignSequenceGPU.cu:14-40, 362-461).  Here:

* the DP matrix is cut into column strips sized to keep the strip's
  query profile + row state in VMEM;
* each strip runs top-to-bottom as strip_fill_pallas calls over row
  blocks, carrying the strip's last DP row on device and streaming the
  2-bit packed direction words to host RAM (4x smaller than the
  reference's byte matrix);
* strips exchange their boundary columns through HBM arrays — the
  structural, race-free analog of the spin-lock protocol;
* Smith-Waterman best-cell states are merged across strips
  lexicographically (max value, then smallest row, then smallest
  column), reproducing the reference's row-major first-occurrence
  semantics exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from . import pallas_fill
from .pallas_fill import (
    DIR_ROWS_PER_WORD,
    PAD_SCORE,
    ROWS_PER_STEP,
    SUBLANES,
    TILE_PAIRS,  # noqa: F401  (re-export convenience)
)

_INT = jnp.int32

# Default strip width in DP columns (multiple of 1024); sized so a
# protein profile (23 x width x 4 B) plus row state fits in VMEM.
DEFAULT_STRIP_COLS = 32768
# Row-block granularity for streaming the direction words to host.
DEFAULT_BLOCK_ROWS = 8192


@dataclasses.dataclass
class TiledResult:
    score: int
    best_i: int
    best_j: int
    # Packed direction words (host RAM), shape (m_pad/16, total_p_cols),
    # or None in score-only mode.
    words: Optional[np.ndarray]
    p_cols: int


def _strip_profile(text_np: np.ndarray, sm: np.ndarray, k_alpha: int,
                   strip_off: int, strip_cols: int, n: int) -> jax.Array:
    """(K, 8, L) profile of text[strip_off : strip_off+strip_cols]."""
    chunk = text_np[strip_off : strip_off + strip_cols]
    prof = sm[:k_alpha][:, chunk].astype(np.int32)
    pad = strip_cols - chunk.shape[0]
    if pad:
        prof = np.pad(prof, ((0, 0), (0, pad)), constant_values=PAD_SCORE)
    return jnp.asarray(
        prof.reshape(k_alpha, SUBLANES, strip_cols // SUBLANES)
    )


def tiled_fill(text, pattern, score_matrix, k_alpha: int, gap: int,
               local: bool = False, with_dirs: bool = True,
               strip_cols: int = DEFAULT_STRIP_COLS,
               block_rows: int = DEFAULT_BLOCK_ROWS) -> TiledResult:
    """Fill an arbitrarily large single-pair DP matrix.

    Memory: device holds one strip's state (O(strip columns)) plus one
    row-block of direction words; host accumulates the packed direction
    matrix (2 bits/cell) when with_dirs.
    """
    text_np = np.asarray(text, dtype=np.int32)
    pattern_np = np.asarray(pattern, dtype=np.int32)
    sm = np.asarray(score_matrix, dtype=np.int32).reshape(-1)[
        : k_alpha * k_alpha
    ].reshape(k_alpha, k_alpha)
    n, m = text_np.shape[0], pattern_np.shape[0]
    gap = int(gap)
    interpret = config.pallas_interpret()

    m_pad = max(ROWS_PER_STEP, ((m + ROWS_PER_STEP - 1) // ROWS_PER_STEP)
                * ROWS_PER_STEP)
    block_rows = min(
        m_pad,
        pallas_fill.MAX_CHUNK_ROWS,
        max(ROWS_PER_STEP, (block_rows // ROWS_PER_STEP) * ROWS_PER_STEP),
    )
    num_strips = max(1, -(-n // strip_cols))
    total_p = num_strips * strip_cols
    l = strip_cols // SUBLANES

    pat_pad = np.zeros(m_pad, dtype=np.int32)
    pat_pad[:m] = pattern_np
    pat_dev = jnp.asarray(pat_pad)

    words_host = (
        np.empty((m_pad // DIR_ROWS_PER_WORD, total_p), dtype=np.int32)
        if with_dirs
        else None
    )

    # Boundary columns: S[i, strip_off] for i = 0..m_pad, per strip edge.
    left_col = jnp.asarray(
        pallas_fill.nw_boundary_col(0, m_pad, gap, local)
    )
    strip_states = []

    for c in range(num_strips):
        strip_off = c * strip_cols
        profile = _strip_profile(text_np, sm, k_alpha, strip_off,
                                 strip_cols, n)
        prev_row = jnp.asarray(
            pallas_fill.init_prev_row(l, strip_off, gap, local)
        )
        state = jnp.asarray(pallas_fill._zeros_state(local))
        # Right boundary column assembled across row blocks; entry 0 is
        # the init-row value S[0, strip_off + strip_cols].
        top_val = 0 if local else -gap * (strip_off + strip_cols)
        rcol_parts = [jnp.full((1,), top_val, _INT)]

        for row_base in range(0, m_pad, block_rows):
            rows_here = min(block_rows, m_pad - row_base)
            dirs, prev_row, rcol, state = pallas_fill.strip_fill_pallas(
                profile,
                pat_dev[row_base : row_base + rows_here],
                gap, n, m, row_base, strip_off,
                left_col[row_base : row_base + rows_here + 1],
                prev_row, state,
                local=local, with_dirs=with_dirs, interpret=interpret,
            )
            rcol_parts.append(rcol)
            if with_dirs:
                w = np.asarray(jax.device_get(dirs))
                words_host[
                    row_base // DIR_ROWS_PER_WORD :
                    (row_base + rows_here) // DIR_ROWS_PER_WORD,
                    strip_off : strip_off + strip_cols,
                ] = w.reshape(w.shape[0], -1)

        strip_states.append(np.asarray(jax.device_get(state))[0])
        if c + 1 < num_strips:
            left_col = jnp.concatenate(rcol_parts)

    # Merge per-strip states.
    if local:
        # Row-major first occurrence of the global max: max value, then
        # smallest row, then smallest column.
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
    return TiledResult(
        score=score, best_i=bi, best_j=bj, words=words_host, p_cols=total_p
    )


def tiled_fill_score(text, pattern, score_matrix, k_alpha: int, gap: int,
                     local: bool = False,
                     strip_cols: int = DEFAULT_STRIP_COLS) -> int:
    """Score-only tiled fill (no direction matrix, O(strip) memory)."""
    result = tiled_fill(
        text, pattern, score_matrix, k_alpha, gap,
        local=local, with_dirs=False, strip_cols=strip_cols,
        block_rows=1 << 30,
    )
    return result.score
