"""Pallas TPU kernels for the DP matrix fill.

The hot path of the framework.  Two kernel families:

* :func:`batch_score_pallas` — throughput kernel: 8 pairs per grid step,
  one pair per VPU sublane, DP columns on lanes.  Each DP row is one
  fully-dense vector step; the left-to-right dependency is resolved with
  a masked-roll Kogge-Stone prefix max (the max-plus scan identity, see
  ops/scan_engine.py).  The reference's analog is the anti-diagonal
  wavefront + 32 concurrent streams (alignSequenceGPU.cu:73-353); here
  the whole matrix-fill wave lives in VMEM/registers and there is no
  inter-chunk protocol at all.

* :func:`pair_fill_pallas` — single-pair fill emitting the traceback
  direction matrix, 2-bit packed (16 DP rows per int32 word), plus the
  score (and best-cell coordinates for local alignment).  One DP row is
  held as an (8, L) "segmented" vector (segment s on sublane s holds
  columns s*L..s*L+L-1, which is plain row-major order in memory), so
  every vector op runs at full VPU density; the lane prefix max is
  followed by a tiny cross-sublane carry fix.  The reference's analog is
  cuda_fillMatrixNW/SW + the columnState spin-lock pipeline
  (alignSequenceGPU.cu:14-353); here the row dependency is structural.

Scores are int32; all shapes static; lane position p holds DP column
j = p+1 (the j=0 gap column is folded into the recurrence boundary), and
direction words for DP row i live at word row (i-1)//16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INT = jnp.int32
NEG_INF = -(1 << 30)
PAD_SCORE = -(1 << 24)
SUBLANES = 8


def _prefix_max_lanes(x: jax.Array, lane: jax.Array) -> jax.Array:
    """Inclusive prefix max along lanes (axis 1) via masked doubling."""
    n = x.shape[1]
    k = 1
    while k < n:
        rolled = pltpu.roll(x, k, axis=1)
        x = jnp.maximum(x, jnp.where(lane >= k, rolled, NEG_INF))
        k *= 2
    return x


def _shift_right_lanes(x: jax.Array, lane: jax.Array, fill) -> jax.Array:
    """y[:, l] = x[:, l-1]; y[:, 0] = fill (scalar or (8,1))."""
    rolled = pltpu.roll(x, 1, axis=1)
    return jnp.where(lane == 0, fill, rolled)


def _batch_kernel(k_alpha: int, local: bool, m_rows: int,
                  gap_ref, sm_ref, texts_ref, pats_ref, ns_ref, ms_ref,
                  out_ref, prof_ref):
    n = texts_ref.shape[1]
    g = gap_ref[0, 0]
    lane = jax.lax.broadcasted_iota(_INT, (SUBLANES, n), 1)
    nvec = ns_ref[:]  # (8, 1)
    mvec = ms_ref[:]
    gj = g * (lane + 1)

    # Per-tile query profiles, built in VMEM with a K^2 select chain
    # (texts stay int32 in VMEM; no HBM profile array).
    text = texts_ref[:]
    for a in range(k_alpha):
        acc = jnp.zeros((SUBLANES, n), _INT)
        for c in range(k_alpha):
            acc = jnp.where(text == c, sm_ref[a, c], acc)
        prof_ref[:, a, :] = acc

    col_ok = lane < nvec  # lane l <-> column j = l+1; valid iff j <= n
    lane128 = jax.lax.broadcasted_iota(_INT, (SUBLANES, 128), 1)

    def row_step(i, pat_chunk, carry):
        prev, acc = carry
        # Extract this row's pattern letter per pair: lanes can't be
        # dynamically sliced, so mask+reduce the 128-wide chunk.
        r = (i - 1) % 128
        pat_col = jnp.max(
            jnp.where(lane128 == r, pat_chunk, 0), axis=1, keepdims=True
        )
        sub = jnp.zeros((SUBLANES, n), _INT)
        for a in range(k_alpha):
            sub = jnp.where(pat_col == a, prof_ref[:, a, :], sub)

        boundary = jnp.asarray(0, _INT) if local else -(g * (i - 1))
        diag = _shift_right_lanes(prev, lane, boundary) + sub
        top = prev - g
        tmp = jnp.maximum(diag, top)
        if local:
            tmp = jnp.maximum(tmp, 0)
        c_vec = tmp + gj
        # Fold in the j=0 boundary candidate (S[i,0] with offset g*0).
        c0 = jnp.asarray(0, _INT) if local else -(g * i)
        c_vec = jnp.where(lane == 0, jnp.maximum(c_vec, c0), c_vec)
        row = _prefix_max_lanes(c_vec, lane) - gj

        if local:
            masked = jnp.where(
                jnp.logical_and(col_ok, i <= mvec), row, NEG_INF
            )
            acc = jnp.maximum(acc, masked)
        else:
            acc = jnp.where(i == mvec, row, acc)
        return (row, acc)

    def chunk_step(c, carry):
        base = pl.multiple_of(c * 128, 128)
        pat_chunk = pats_ref[:, pl.ds(base, 128)]

        def inner(r, carry):
            return row_step(c * 128 + r + 1, pat_chunk, carry)

        return jax.lax.fori_loop(0, 128, inner, carry)

    prev0 = jnp.zeros((SUBLANES, n), _INT) if local else -gj
    acc0 = jnp.full((SUBLANES, n), NEG_INF, _INT) if local else prev0
    _, acc = jax.lax.fori_loop(0, m_rows // 128, chunk_step, (prev0, acc0))

    if local:
        score = jnp.maximum(jnp.max(acc, axis=1, keepdims=True), 0)
    else:
        at_n = jnp.where(lane == nvec - 1, acc, NEG_INF)
        score = jnp.max(at_n, axis=1, keepdims=True)
    out_ref[:, :] = jnp.broadcast_to(score, (SUBLANES, 128))


@functools.partial(
    jax.jit, static_argnames=("k_alpha", "local", "interpret")
)
def batch_score_pallas(texts, patterns, ns, ms, score_matrix, gap,
                       k_alpha: int, local: bool = False,
                       interpret: bool = False):
    """Optimal scores for a padded batch (Pallas throughput kernel).

    Args:
      texts: (B, N) int32, N multiple of 128, B multiple of 8.
      patterns: (B, M) int32, M multiple of 128.
      ns, ms: (B,) real lengths.
      score_matrix: (K, K) int32.
      gap: scalar int32.
      k_alpha: static alphabet size (4 dna / 23 protein).
      local: Smith-Waterman when True.

    Returns (B,) int32 scores.
    """
    b, n = texts.shape
    m = patterns.shape[1]
    assert b % SUBLANES == 0 and n % 128 == 0
    num_tiles = b // SUBLANES

    gap_arr = jnp.asarray(gap, _INT).reshape(1, 1)
    sm = jnp.asarray(score_matrix, _INT)[:k_alpha, :k_alpha]
    ns2 = jnp.asarray(ns, _INT).reshape(b, 1)
    ms2 = jnp.asarray(ms, _INT).reshape(b, 1)

    kernel = functools.partial(_batch_kernel, k_alpha, local, m)
    out = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (k_alpha, k_alpha), lambda t: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((SUBLANES, n), lambda t: (t, 0)),
            pl.BlockSpec((SUBLANES, m), lambda t: (t, 0)),
            pl.BlockSpec((SUBLANES, 1), lambda t: (t, 0)),
            pl.BlockSpec((SUBLANES, 1), lambda t: (t, 0)),
        ],
        out_specs=pl.BlockSpec((SUBLANES, 128), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 128), _INT),
        scratch_shapes=[pltpu.VMEM((SUBLANES, k_alpha, n), _INT)],
        interpret=interpret,
    )(gap_arr, sm, texts.astype(_INT), patterns.astype(_INT), ns2, ms2)
    return out[:, 0]


# ----------------------------------------------------------------------------
# Single-pair fill kernel (directions + score).

DIR_ROWS_PER_WORD = 16  # 2-bit directions, 16 DP rows packed per int32
ROWS_PER_STEP = 128     # DP rows per grid step


def _sublane_excl_prefix_max(segmax: jax.Array, sub_iota: jax.Array) -> jax.Array:
    """Exclusive prefix max over the 8 sublanes of an (8, 1) column."""
    x = segmax
    k = 1
    while k < SUBLANES:
        rolled = pltpu.roll(x, k, axis=0)
        x = jnp.maximum(x, jnp.where(sub_iota >= k, rolled, NEG_INF))
        k *= 2
    rolled = pltpu.roll(x, 1, axis=0)
    return jnp.where(sub_iota == 0, NEG_INF, rolled)


def _pair_kernel(local: bool, rows_total: int,
                 gap_ref, nm_ref, prof_ref, pats_ref,
                 dirs_ref, score_ref, besti_ref, bestj_ref,
                 prev_ref, saved_ref):
    t = pl.program_id(0)
    num_steps = pl.num_programs(0)
    l = prof_ref.shape[2]
    g = gap_ref[0, 0]
    n = nm_ref[0, 0]
    m = nm_ref[0, 1]

    lane = jax.lax.broadcasted_iota(_INT, (SUBLANES, l), 1)
    sub = jax.lax.broadcasted_iota(_INT, (SUBLANES, l), 0)
    sub_col = jax.lax.broadcasted_iota(_INT, (SUBLANES, 1), 0)
    jpos = sub * l + lane + 1  # DP column held at (sublane, lane)
    gj = g * jpos
    pos00 = jnp.logical_and(lane == 0, sub == 0)
    col_ok = jpos <= n

    @pl.when(t == 0)
    def _init():
        prev_ref[:, :] = (
            jnp.zeros((SUBLANES, l), _INT) if local else -gj
        )
        score_ref[0, 0] = NEG_INF
        besti_ref[0, 0] = 0
        bestj_ref[0, 0] = 0
        if local:
            saved_ref[:, :] = jnp.full((SUBLANES, l), NEG_INF, _INT)

    def shift_right(x, boundary):
        rolled = pltpu.roll(x, 1, axis=1)
        lastcol = pltpu.roll(x[:, l - 1 : l], 1, axis=0)
        y = jnp.where(lane == 0, lastcol, rolled)
        return jnp.where(pos00, boundary, y)

    def row_step(r, carry):
        prev, dirpack = carry
        i = t * ROWS_PER_STEP + r + 1
        pat = pats_ref[0, r]
        sub_scores = prof_ref[pat]

        s_im1_0 = jnp.asarray(0, _INT) if local else -(g * (i - 1))
        s_i_0 = jnp.asarray(0, _INT) if local else -(g * i)
        diag = shift_right(prev, s_im1_0) + sub_scores
        top = prev - g
        tmp = jnp.maximum(diag, top)
        if local:
            tmp = jnp.maximum(tmp, 0)
        b_vec = tmp + gj
        b_vec = jnp.where(pos00, jnp.maximum(b_vec, s_i_0), b_vec)
        pc = _prefix_max_lanes(b_vec, lane)
        excl = _sublane_excl_prefix_max(pc[:, l - 1 : l], sub_col)
        row = jnp.maximum(pc, excl) - gj

        # Directions under the reference tie policy.
        left = shift_right(row, s_i_0) - g
        gap_best = jnp.maximum(left, top)
        is_diag = diag > gap_best
        d = jnp.where(is_diag, 1, jnp.where(left >= top, 0, 2)).astype(_INT)
        if local:
            best_un = jnp.maximum(diag, gap_best)
            d = jnp.where(best_un > 0, d, 3)
        word = d << (2 * (r % DIR_ROWS_PER_WORD))
        dirpack = jnp.where(r % DIR_ROWS_PER_WORD == 0, word, dirpack | word)

        @pl.when(r % DIR_ROWS_PER_WORD == DIR_ROWS_PER_WORD - 1)
        def _flush():
            dirs_ref[r // DIR_ROWS_PER_WORD] = dirpack

        if local:
            masked = jnp.where(col_ok, row, NEG_INF)
            rm = jnp.max(masked)
            improved = jnp.logical_and(rm > score_ref[0, 0], i <= m)

            @pl.when(improved)
            def _track():
                score_ref[0, 0] = rm
                besti_ref[0, 0] = i
                saved_ref[:, :] = masked
        else:
            @pl.when(i == m)
            def _capture():
                score_ref[0, 0] = jnp.max(
                    jnp.where(jpos == n, row, NEG_INF)
                )
        return row, dirpack

    dirpack0 = jnp.zeros((SUBLANES, l), _INT)
    prev, _ = jax.lax.fori_loop(
        0, ROWS_PER_STEP, row_step, (prev_ref[:, :], dirpack0)
    )
    prev_ref[:, :] = prev

    if local:
        @pl.when(t == num_steps - 1)
        def _argmax():
            # First column (row-major first occurrence) of the best value
            # in the winning row; 0-score alignments keep (0, 0) like the
            # reference's maxIJ=0 initialisation.
            has_best = score_ref[0, 0] > 0
            cand = jnp.where(
                saved_ref[:, :] == score_ref[0, 0], jpos, jnp.asarray(1 << 30, _INT)
            )
            bestj_ref[0, 0] = jnp.where(has_best, jnp.min(cand), 0)
            besti_ref[0, 0] = jnp.where(has_best, besti_ref[0, 0], 0)
            score_ref[0, 0] = jnp.maximum(score_ref[0, 0], 0)


@functools.partial(
    jax.jit, static_argnames=("local", "interpret")
)
def pair_fill_pallas(profile, pattern, gap, n, m, local: bool = False,
                     interpret: bool = False):
    """Single-pair DP fill -> packed direction matrix + score (+ best cell).

    Args:
      profile: (K, 8, L) int32 query profile in segmented layout; position
        p = s*L + l holds score(a, text[p]) and PAD_SCORE for p >= n.
      pattern: (M_pad,) int32, M_pad a multiple of 128.
      gap: scalar int32.
      n, m: real lengths as (1, 2) is built internally from these scalars.
      local: Smith-Waterman when True.

    Returns (dirs_packed, score, best_i, best_j):
      dirs_packed: (M_pad/16, 8, L) int32 — word w at position p holds the
        2-bit directions of DP rows 16w+1 .. 16w+16 at column p+1
        (bits 2k.. for row 16w+k+1).  Row-major bytes are the natural
        column order, so numpy can reshape to (M_pad/16, P).
      score: int32 optimal score (NW: S[m, n]; SW: best, clamped >= 0).
      best_i, best_j: SW best-cell DP coordinates (0 when score == 0).
    """
    k_alpha, sublanes, l = profile.shape
    assert sublanes == SUBLANES
    m_pad = pattern.shape[0]
    assert m_pad % ROWS_PER_STEP == 0
    num_steps = m_pad // ROWS_PER_STEP

    gap_arr = jnp.asarray(gap, _INT).reshape(1, 1)
    nm = jnp.stack(
        [jnp.asarray(n, _INT), jnp.asarray(m, _INT)]
    ).reshape(1, 2)
    pats = pattern.astype(_INT).reshape(num_steps, ROWS_PER_STEP)

    kernel = functools.partial(_pair_kernel, local, m_pad)
    words_per_step = ROWS_PER_STEP // DIR_ROWS_PER_WORD
    dirs, score, besti, bestj = pl.pallas_call(
        kernel,
        grid=(num_steps,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((k_alpha, SUBLANES, l), lambda t: (0, 0, 0)),
            pl.BlockSpec(
                (1, ROWS_PER_STEP), lambda t: (t, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((words_per_step, SUBLANES, l), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(
                (m_pad // DIR_ROWS_PER_WORD, SUBLANES, l), _INT
            ),
            jax.ShapeDtypeStruct((1, 1), _INT),
            jax.ShapeDtypeStruct((1, 1), _INT),
            jax.ShapeDtypeStruct((1, 1), _INT),
        ),
        scratch_shapes=[
            pltpu.VMEM((SUBLANES, l), _INT),
            pltpu.VMEM((SUBLANES, l), _INT),
        ],
        interpret=interpret,
    )(gap_arr, nm, profile.astype(_INT), pats)
    return dirs, score[0, 0], besti[0, 0], bestj[0, 0]


def build_pair_profile(text, score_matrix, k_alpha: int):
    """Segmented (K, 8, L) profile for pair_fill_pallas (PAD_SCORE beyond n)."""
    text = jnp.asarray(text, _INT)
    n = text.shape[0]
    p_cols = max(1024, ((n + 1023) // 1024) * 1024)
    sm = jnp.asarray(score_matrix, _INT)[:k_alpha, :k_alpha]
    pad = p_cols - n
    prof = sm[:, text]
    prof = jnp.pad(prof, ((0, 0), (0, pad)), constant_values=PAD_SCORE)
    return prof.reshape(k_alpha, SUBLANES, p_cols // SUBLANES), p_cols
