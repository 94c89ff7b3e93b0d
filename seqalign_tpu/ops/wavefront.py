"""Skewed-wavefront single-pair fill kernel.

The fastest single-pair engine: a systolic mapping where vector slot
s (of 1024 = 8 sublanes x 128 lanes) owns DP row i0+s+1 and the sweep
variable t advances columns — at step t, slot s computes cell
(i0+s+1, t-s+1).  All DP dependencies then come from the same slot or
the neighboring slot at earlier steps, so a step is ~35 dense (8, 128)
vector ops for 1024 cells: no prefix scan, no reductions, no gathers.
This is the TPU-native expression of the reference's anti-diagonal
wavefront (cuda_fillMatrixNW, alignSequenceGPU.cu:73-178), with the
inter-chunk spin-lock protocol replaced by SMEM step streams carrying
the strip's bottom row to the next 1024-row strip.

Boundary trick: slots not yet reached by the wave (j < 1) hold the DP
boundary column S[i, 0] in their state, so the frontier needs no special
casing — the masked update preserves them until the wave arrives.

Direction bits are emitted in a *skewed word format*: word block
b = t//16 at slot s holds the 2-bit directions of steps 16b..16b+15
(bit 2*(t%16)), i.e. columns j = t-s+1.  The native traceback
sa_traceback_*_skewed resolves (i, j) -> (strip, slot, t) directly.

Best-cell tracking is per-slot (per-row): running row maximum with
strict-improvement first-column capture, merged across rows on host —
reproducing the reference's row-major first-occurrence semantics
exactly (alignSequenceCPU.cpp:191-192).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fill import NEG_INF, SUBLANES

_INT = jnp.int32
SLOTS = 1024           # rows per strip = vector slots (8 x 128)
STEPS = 256            # sweep steps per grid block (multiple of 16)
DIR_STEPS_PER_WORD = 16


def _wavefront_kernel(k_alpha: int, local: bool, with_dirs: bool,
                      scal_ref, sm_ref, text_ref, bot_in_ref, pat_ref,
                      dirs_ref, bot_out_ref, rowmax_ref, argj_ref, snap_ref,
                      cur_scr, topprev_scr, w_scr, acc_scr, aj_scr, snap_scr,
                      coll_scr, coef_scr):
    g_blk = pl.program_id(0)
    num_blk = pl.num_programs(0)
    gap = scal_ref[0, 0]
    n = scal_ref[0, 1]
    m = scal_ref[0, 2]
    i0 = scal_ref[0, 3]

    lane = jax.lax.broadcasted_iota(_INT, (SUBLANES, 128), 1)
    sub = jax.lax.broadcasted_iota(_INT, (SUBLANES, 128), 0)
    slot = sub * 128 + lane
    pos00 = slot == 0
    pos_last = slot == SLOTS - 1
    ivec = i0 + slot + 1
    row_ok = ivec <= m

    def shift_slots(x, fill):
        rolled = pltpu.roll(x, 1, axis=1)
        lastcol = pltpu.roll(x[:, 127:128], 1, axis=0)
        y = jnp.where(lane == 0, lastcol, rolled)
        return jnp.where(pos00, fill, y)

    @pl.when(g_blk == 0)
    def _init():
        boundary = (
            jnp.zeros((SUBLANES, 128), _INT) if local else -(gap * ivec)
        )
        cur_scr[:, :] = boundary
        # topprev's init only matters for slot 0 at t=0, whose diagonal
        # ancestor is the corner H[i0, 0]; other slots get their first
        # diagonal via the shift chain.
        topprev_scr[:, :] = (
            boundary if local else jnp.where(pos00, -(gap * i0), boundary)
        )
        w_scr[:, :] = jnp.zeros((SUBLANES, 128), _INT)
        acc_scr[:, :] = jnp.full((SUBLANES, 128), NEG_INF, _INT)
        aj_scr[:, :] = jnp.zeros((SUBLANES, 128), _INT)
        snap_scr[:, :] = jnp.full((SUBLANES, 128), NEG_INF, _INT)
        # Per-row substitution coefficients: coef[c][s] = sm[pattern_s, c].
        pat = pat_ref[:, :]
        for c in range(k_alpha):
            cc = jnp.zeros((SUBLANES, 128), _INT)
            for a in range(k_alpha):
                cc = jnp.where(pat == a, sm_ref[a, c], cc)
            coef_scr[c] = cc

    coefs = [coef_scr[c] for c in range(k_alpha)]

    # Manual 16x unroll: one fori iteration handles one direction word's
    # worth of steps, so the word's bit positions are static, the loop
    # overhead amortizes, and flushes sit at static unroll positions.
    assert STEPS % DIR_STEPS_PER_WORD == 0
    unroll = DIR_STEPS_PER_WORD
    acc0 = acc_scr[:, :]
    aj0 = aj_scr[:, :]
    snap0 = snap_scr[:, :]

    def word_fn(k16, carry):
        cur, topprev, w, coll, acc, aj, snap = carry
        word = jnp.zeros((SUBLANES, 128), _INT)
        for r in range(unroll):
            k = k16 * unroll + r
            t = g_blk * STEPS + k
            jvec = t - slot + 1

            # Frontier injections (scalar unit): new column's text letter
            # and the strip's top boundary row value H[i0, t+1].
            w = shift_slots(w, text_ref[0, 0, k])
            top = shift_slots(cur, bot_in_ref[0, 0, k])
            diag_src = topprev

            sub_scores = coefs[k_alpha - 1]
            for c in range(k_alpha - 1):
                sub_scores = jnp.where(w == c, coefs[c], sub_scores)

            diag = diag_src + sub_scores
            left = cur
            gap_best = jnp.maximum(top, left) - gap
            best = jnp.maximum(diag, gap_best)
            newval = jnp.maximum(best, 0) if local else best

            started = jvec >= 1
            cur_next = jnp.where(started, newval, cur)

            if with_dirs:
                is_diag = diag > gap_best
                is_left = jnp.logical_and(
                    jnp.logical_not(is_diag), left >= top
                )
                d = jnp.where(
                    is_diag, 1, jnp.where(is_left, 0, 2)
                ).astype(_INT)
                if local:
                    d = jnp.where(best > 0, d, 3)
                word = d if r == 0 else word | (d << (2 * r))

            # Bottom-row stream for the next strip: slot 1023's values
            # collected vectorially (roll left, insert at the end).
            coll = jnp.where(
                pos_last, cur_next, pltpu.roll(coll, 127, axis=1)
            )

            if local:
                valid = jnp.logical_and(
                    started, jnp.logical_and(jvec <= n, row_ok)
                )
                cand = jnp.where(valid, newval, NEG_INF)
                improved = cand > acc
                acc = jnp.maximum(acc, cand)
                aj = jnp.where(improved, jvec, aj)
            else:
                hit = jnp.logical_and(ivec == m, jvec == n)
                snap = jnp.where(hit, newval, snap)

            cur, topprev = cur_next, top

        if with_dirs:
            dirs_ref[k16] = word

        @pl.when(k16 % (128 // unroll) == (128 // unroll) - 1)
        def _flush_bottom():
            bot_out_ref[(k16 * unroll) // 128] = coll

        return cur, topprev, w, coll, acc, aj, snap

    cur, topprev, w, _, acc, aj, snap = jax.lax.fori_loop(
        0, STEPS // unroll, word_fn,
        (cur_scr[:, :], topprev_scr[:, :], w_scr[:, :], coll_scr[:, :],
         acc0, aj0, snap0),
    )
    cur_scr[:, :] = cur
    topprev_scr[:, :] = topprev
    w_scr[:, :] = w
    if local:
        acc_scr[:, :] = acc
        aj_scr[:, :] = aj
    else:
        snap_scr[:, :] = snap

    @pl.when(g_blk == num_blk - 1)
    def _finish():
        rowmax_ref[:, :] = acc_scr[:, :]
        argj_ref[:, :] = aj_scr[:, :]
        snap_ref[:, :] = snap_scr[:, :]


@functools.partial(
    jax.jit,
    static_argnames=("k_alpha", "local", "with_dirs", "interpret"),
)
def wavefront_strip(text_steps, bottom_in, pattern_slots, score_matrix,
                    gap, n, m, i0, k_alpha: int, local: bool = False,
                    with_dirs: bool = True, interpret: bool = False):
    """Run one 1024-row strip sweep.

    Args:
      text_steps: (num_blocks, STEPS) int32 — text letter entering at each
        step (text[t], padded arbitrarily beyond n).
      bottom_in: (num_blocks, STEPS) int32 — strip's top boundary row:
        H[i0, t+1] per step (for strip 0: -g*(t+1) / 0).
      pattern_slots: (8, 128) int32 — pattern letters of rows i0+1..i0+1024.
      gap, n, m, i0: scalars.

    Returns (dirs, bottom_out, rowmax, argj, snap):
      dirs: (num_blocks*STEPS/16, 8, 128) skewed words (dummy when
        with_dirs=False);
      bottom_out: (num_blocks, STEPS) — H[i0+1024, t-1022] at index t;
      rowmax/argj: per-slot row maxima and first best column (local);
      snap: (8,128) holding S[m, n] at slot m-1-i0 (global).
    """
    num_blocks, steps = text_steps.shape
    assert steps == STEPS

    scal = jnp.stack(
        [jnp.asarray(x, _INT) for x in (gap, n, m, i0)]
    ).reshape(1, 4)
    sm = jnp.asarray(score_matrix, _INT)[:k_alpha, :k_alpha]

    kernel = functools.partial(_wavefront_kernel, k_alpha, local, with_dirs)
    words_per_block = STEPS // DIR_STEPS_PER_WORD
    if with_dirs:
        dirs_shape = (num_blocks * words_per_block, SUBLANES, 128)
        dirs_spec = pl.BlockSpec(
            (words_per_block, SUBLANES, 128), lambda g: (g, 0, 0)
        )
    else:
        dirs_shape = (1, SUBLANES, 128)
        dirs_spec = pl.BlockSpec((1, SUBLANES, 128), lambda g: (0, 0, 0))

    smem = lambda shape, idx: pl.BlockSpec(  # noqa: E731
        shape, idx, memory_space=pltpu.SMEM
    )
    vec_spec = pl.BlockSpec((SUBLANES, 128), lambda g: (0, 0))

    dirs, bot_out, rowmax, argj, snap = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            smem((1, 4), lambda g: (0, 0)),
            smem((k_alpha, k_alpha), lambda g: (0, 0)),
            smem((1, 1, STEPS), lambda g: (g, 0, 0)),
            smem((1, 1, STEPS), lambda g: (g, 0, 0)),
            vec_spec,
        ],
        out_specs=(
            dirs_spec,
            pl.BlockSpec(
                (STEPS // 128, SUBLANES, 128), lambda g: (g, 0, 0)
            ),
            vec_spec,
            vec_spec,
            vec_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct(dirs_shape, _INT),
            jax.ShapeDtypeStruct(
                (num_blocks * (STEPS // 128), SUBLANES, 128), _INT
            ),
            jax.ShapeDtypeStruct((SUBLANES, 128), _INT),
            jax.ShapeDtypeStruct((SUBLANES, 128), _INT),
            jax.ShapeDtypeStruct((SUBLANES, 128), _INT),
        ),
        scratch_shapes=[pltpu.VMEM((SUBLANES, 128), _INT)] * 7
        + [pltpu.VMEM((k_alpha, SUBLANES, 128), _INT)],
        interpret=interpret,
    )(scal, sm, text_steps.astype(_INT).reshape(num_blocks, 1, STEPS),
      bottom_in.astype(_INT).reshape(num_blocks, 1, STEPS),
      pattern_slots.astype(_INT))
    # Collector flush f (one per 128 steps) holds, at (sublane 7, lane l),
    # the slot-1023 value of step f*128 + l.
    bot_flat = bot_out[:, SUBLANES - 1, :].reshape(-1)
    return dirs, bot_flat.reshape(num_blocks, STEPS), rowmax, argj, snap


def wavefront_fill(text, pattern, score_matrix, k_alpha: int, gap: int,
                   local: bool = False, with_dirs: bool = True,
                   interpret: bool = False):
    """Full single-pair fill via 1024-row wavefront strips.

    Returns (score, best_i, best_j, words, steps_pad) where words is the
    host-assembled skewed direction matrix of shape
    (num_strips, steps_pad/16, 1024) (None when with_dirs=False).
    """
    text_np = np.asarray(text, dtype=np.int32)
    pattern_np = np.asarray(pattern, dtype=np.int32)
    sm = np.asarray(score_matrix, dtype=np.int32)
    n, m = text_np.shape[0], pattern_np.shape[0]
    gap = int(gap)

    num_strips = max(1, -(-m // SLOTS))
    total_steps = n + SLOTS - 1
    steps_pad = -(-total_steps // STEPS) * STEPS
    num_blocks = steps_pad // STEPS

    text_steps = np.zeros(steps_pad, dtype=np.int32)
    text_steps[:n] = text_np
    text_steps = text_steps.reshape(num_blocks, STEPS)

    pat_pad = np.zeros(num_strips * SLOTS, dtype=np.int32)
    pat_pad[:m] = pattern_np

    if local:
        bottom = np.zeros(steps_pad, dtype=np.int32)
    else:
        bottom = (-gap * (np.arange(steps_pad, dtype=np.int64) + 1)).astype(
            np.int32
        )
    bottom = jnp.asarray(bottom.reshape(num_blocks, STEPS))

    words = (
        np.empty((num_strips, steps_pad // DIR_STEPS_PER_WORD, SLOTS),
                 dtype=np.int32)
        if with_dirs
        else None
    )
    rowmaxs, argjs, snaps = [], [], []
    ts_dev = jnp.asarray(text_steps)
    for c in range(num_strips):
        i0 = c * SLOTS
        pat_slots = jnp.asarray(
            pat_pad[i0 : i0 + SLOTS].reshape(SUBLANES, 128)
        )
        dirs, bot_out, rowmax, argj, snap = wavefront_strip(
            ts_dev, bottom, pat_slots, sm, gap, n, m, i0,
            k_alpha=k_alpha, local=local, with_dirs=with_dirs,
            interpret=interpret,
        )
        if with_dirs:
            w = np.asarray(jax.device_get(dirs))
            words[c] = w.reshape(w.shape[0], SLOTS)
        rowmaxs.append(np.asarray(jax.device_get(rowmax)).reshape(-1))
        argjs.append(np.asarray(jax.device_get(argj)).reshape(-1))
        snaps.append(np.asarray(jax.device_get(snap)).reshape(-1))
        if c + 1 < num_strips:
            # Next strip's top boundary: H[i0+1024, t+1] = bot_out[t+1023].
            flat = jnp.reshape(bot_out, (-1,))
            shifted = jnp.concatenate(
                [
                    flat[SLOTS - 1 :],
                    jnp.zeros((SLOTS - 1,), _INT),
                ]
            )
            bottom = shifted.reshape(num_blocks, STEPS)

    if local:
        best, bi, bj = 0, 0, 0
        for c in range(num_strips):
            for s in range(min(SLOTS, m - c * SLOTS)):
                v = int(rowmaxs[c][s])
                if v > best:
                    best, bi, bj = v, c * SLOTS + s + 1, int(argjs[c][s])
        return best, bi, bj, words, steps_pad

    strip = (m - 1) // SLOTS
    score = int(snaps[strip][(m - 1) % SLOTS])
    return score, m, n, words, steps_pad
