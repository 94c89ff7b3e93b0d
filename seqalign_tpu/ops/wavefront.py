"""Skewed-wavefront single-pair fill kernel (R-row blocked).

The fastest single-pair engine: a systolic mapping where vector slot
s (of ``slots``, default 1024 = 8 sublane-rows x 128 lanes) owns R
consecutive DP rows (i0 + R*s + 1 .. i0 + R*s + R) and the sweep
variable t advances columns — at step t, slot s computes column
j = t-s+1 for all of its R rows.  In-slot rows chain without any data
movement, and only the block-edge row needs the neighboring slot's
value, so one step costs two slot-shifts (cross-lane rolls, the
expensive ops on the VPU) + ~18*R cheap elementwise ops for R*slots
cells.  Score-only callers widen slots (4096 = 32 sublane-rows per
vector op) to amortize the sequential row chain's latency — 2x
measured.  This is the TPU-native expression of the reference's
anti-diagonal wavefront (cuda_fillMatrixNW, alignSequenceGPU.cu:73-178),
with the inter-chunk spin-lock protocol replaced by a bottom-row stream
carried to the next strip.

Boundary trick: slots not yet reached by the wave (j < 1) hold the DP
boundary column S[i, 0] in their state, so the frontier needs no
special-casing — the masked update preserves them until the wave
arrives.

Direction bits are emitted in a *skewed word format*: word
(b = t//16, r, s) holds the 2-bit directions of steps 16b..16b+15 of
slot s's row r (bit 2*(t%16)), i.e. columns j = t-s+1.  The native
walkers sa_traceback_*_skewed resolve (i, j) -> (strip, slot, r, t)
directly.

Best-cell tracking is per-row: running row maximum with
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

from .pallas_fill import (
    NEG_INF,
    SUB_BIAS,
    pack_score_matrix,
    pack_score_matrix_traced,
)

_INT = jnp.int32
SLOTS = 1024           # vector slots (8 sublanes x 128 lanes)
ROWS_PER_SLOT = 8      # DP rows per slot ("R"); strip = R * 1024 rows
STEPS = 256            # sweep steps per grid block (multiple of 16)
# Geometries at/above this rps run the word body as two half-unrolled
# fori trips instead of one fully unrolled 16-step body — the Mosaic
# backend dies on the 16 x 32-cell body (BENCH_NOTES rps=32 analysis).
# Kernels below the threshold trace EXACTLY as before (cache-valid).
SPLIT_BODY_RPS = 32
DIR_STEPS_PER_WORD = 16


def strip_rows(r: int = ROWS_PER_SLOT) -> int:
    return r * SLOTS


NEG_HALF = NEG_INF // 2  # affine E/F "-inf": survives repeated -extend


def _wavefront_kernel(k_alpha: int, local: bool, with_dirs: bool, rps: int,
                      ckpt_every: int, slots: int, semi: bool,
                      has_left: bool, affine: bool,
                      scal_ref, sm_ref, text_ref, bot_in_ref, pat_ref,
                      *refs):
    refs = list(refs)
    fbot_in_ref = refs.pop(0) if affine else None
    left_ref = refs.pop(0) if has_left else None
    left_e_ref = refs.pop(0) if (affine and has_left) else None
    dirs_ref = refs.pop(0)
    dirs2_ref = refs.pop(0) if affine else None
    bot_out_ref = refs.pop(0)
    fbot_out_ref = refs.pop(0) if affine else None
    (rowmax_ref, argj_ref, snap_ref, ckpt_ref) = refs[:4]
    refs = refs[4:]
    ckpte_ref = refs.pop(0) if affine else None
    (cur_scr, topsh_scr, w_scr, acc_scr, aj_scr, snap_scr,
     coll_scr, coef_scr, ckpt_scr) = refs[:9]
    refs = refs[9:]
    if affine:
        evec_scr, flast_scr, fcoll_scr, ckpte_scr = refs
    g_blk = pl.program_id(0)
    num_blk = pl.num_programs(0)
    n_planes = -(-k_alpha // 4)
    gap = scal_ref[0, 0]
    n = scal_ref[0, 1]
    m = scal_ref[0, 2]
    i0 = scal_ref[0, 3]
    ext = scal_ref[0, 4]  # affine gap-extend (gap is then the open cost)

    srows = slots // 128  # sublane-rows per vector op (slots/128 vregs)
    lane = jax.lax.broadcasted_iota(_INT, (srows, 128), 1)
    sub = jax.lax.broadcasted_iota(_INT, (srows, 128), 0)
    slot = sub * 128 + lane
    pos00 = slot == 0
    pos_last = slot == slots - 1
    # Row index per in-slot row r: ivec_r = i0 + rps*slot + r + 1.
    ibase = i0 + rps * slot

    def shift_slots(x, fill):
        rolled = pltpu.roll(x, 1, axis=1)
        lastcol = pltpu.roll(x[:, 127:128], 1, axis=0)
        y = jnp.where(lane == 0, lastcol, rolled)
        return jnp.where(pos00, fill, y)

    @pl.when(g_blk == 0)
    def _init():
        # Left boundary column: slot s's row r starts holding
        # S[i0 + rps*s + r + 1, col_lo] until the wave arrives.  With an
        # explicit left_ref (tile re-fill) the values come from saved
        # checkpoints; otherwise they are the arithmetic column-0
        # boundary.  topsh's init only matters for slot 0 at t=0, whose
        # first diagonal ancestor is the strip corner S[i0, col_lo];
        # other slots get theirs via the shift chain (their neighbor's
        # last-row boundary value, = left_ref[0] per slot).
        if has_left:
            for r in range(rps):
                cur_scr[r] = left_ref[r + 1]
            topsh_scr[:, :] = left_ref[0]
        elif affine:
            # Affine column boundary: H[i, 0] = -(open + (i-1)*extend)
            # for i >= 1, H[0, 0] = 0 (oracle.cpp sa_align_affine).
            for r in range(rps):
                cur_scr[r] = (
                    jnp.zeros((srows, 128), _INT)
                    if local
                    else -(gap + (ibase + r) * ext)
                )
            topsh_scr[:, :] = (
                jnp.zeros((srows, 128), _INT)
                if local
                else jnp.where(ibase == 0, 0, -(gap + (ibase - 1) * ext))
            )
        else:
            for r in range(rps):
                cur_scr[r] = (
                    jnp.zeros((srows, 128), _INT)
                    if local
                    else -(gap * (ibase + r + 1))
                )
            last_boundary = (
                jnp.zeros((srows, 128), _INT) if local else -(gap * ibase)
            )
            topsh_scr[:, :] = (
                last_boundary if local
                else jnp.where(pos00, -(gap * i0), last_boundary)
            )
        if affine:
            if has_left:
                for r in range(rps):
                    evec_scr[r] = left_e_ref[r + 1]
            else:
                for r in range(rps):
                    evec_scr[r] = jnp.full((srows, 128), NEG_HALF, _INT)
            flast_scr[:, :] = jnp.full((srows, 128), NEG_HALF, _INT)
            if ckpt_every:
                for r in range(rps):
                    ckpte_scr[r] = jnp.zeros((srows, 128), _INT)
        w_scr[:, :] = jnp.zeros((srows, 128), _INT)
        if local or semi:
            for r in range(rps):
                acc_scr[r] = jnp.full((srows, 128), NEG_INF, _INT)
                aj_scr[r] = jnp.zeros((srows, 128), _INT)
        else:
            snap_scr[:, :] = jnp.full((srows, 128), NEG_INF, _INT)
        if ckpt_every:
            for r in range(rps):
                ckpt_scr[r] = jnp.zeros((srows, 128), _INT)
        # Packed substitution planes per in-slot row: plane (r, q) holds
        # biased bytes sm[pat_r, 4q..4q+3] (see pack_score_matrix).
        for r in range(rps):
            pat = pat_ref[r]
            for q in range(n_planes):
                cc = jnp.zeros((srows, 128), _INT)
                for a in range(k_alpha):
                    cc = jnp.where(pat == a, sm_ref[a, q], cc)
                coef_scr[r * n_planes + q] = cc

    coefs = [
        [coef_scr[r * n_planes + q] for q in range(n_planes)]
        for r in range(rps)
    ]

    unroll = DIR_STEPS_PER_WORD
    track = local or semi
    acc0 = [acc_scr[r] for r in range(rps)] if track else []
    aj0 = [aj_scr[r] for r in range(rps)] if track else []
    snap0 = snap_scr[:, :]
    cks0 = [ckpt_scr[r] for r in range(rps)] if ckpt_every else []
    evec0 = [evec_scr[r] for r in range(rps)] if affine else []
    flast0 = flast_scr[:, :] if affine else snap_scr[:, :]
    fcoll0 = fcoll_scr[:, :] if affine else snap_scr[:, :]
    ckse0 = (
        [ckpte_scr[r] for r in range(rps)]
        if (affine and ckpt_every)
        else []
    )

    def micro_steps(k16, h, inner, state):
        """inner consecutive sweep steps starting at step h*inner of
        word k16.  h == Python 0 with inner == unroll is the fully
        unrolled path (trace-identical to rounds 1-2, keeping compiled
        executables cache-valid for rps <= 16); a traced h with
        inner == unroll//2 halves the unrolled body for deep rps
        geometries (see BENCH_NOTES rps=32 root-cause analysis)."""
        (words, words2, curs, topsh, w, coll, accs, ajs, snap, cks,
         evecs, flast, fcoll, ckse) = state
        for uu in range(inner):
            u = h * inner + uu  # Python int on the static (h == 0) path
            k = k16 * unroll + u
            t = g_blk * STEPS + k
            jvec = t - slot + 1
            started = jvec >= 1
            if ckpt_every:
                # Column-checkpoint capture: slot s passes checkpoint
                # column q*ckpt_every at step t = q*ckpt_every + s - 1.
                cmask = jnp.logical_and(
                    started, (jvec & (ckpt_every - 1)) == 0
                )

            w = shift_slots(w, text_ref[0, 0, k])
            # Neighbor's last row at this column / previous column.
            nb_top = shift_slots(curs[rps - 1], bot_in_ref[0, 0, k])
            nb_diag = topsh
            if affine:
                # Neighbor's last-row F at this column (F is the
                # vertical gap state; its top boundary streams in like
                # the H bottom row).
                nb_f = shift_slots(flast, fbot_in_ref[0, 0, k])

            # Packed-lookup coordinates of text letter w (shared by all
            # in-slot rows): plane index and byte shift.
            wsh = (w & 3) << 3
            wq = w >> 2 if n_planes > 1 else None

            new_curs = []
            top = nb_top
            diag_src = nb_diag
            if affine:
                f_above = nb_f
            for r in range(rps):
                plane = coefs[r][n_planes - 1]
                for q in range(n_planes - 1):
                    plane = jnp.where(wq == q, coefs[r][q], plane)
                sub_scores = ((plane >> wsh) & 0xFF) - SUB_BIAS
                diag = diag_src + sub_scores
                left = curs[r]
                if affine:
                    # Gotoh: E (LEFT run) carries along the row, F (TOP
                    # run) down the column; gap = open cost here.
                    e_ext = evecs[r] - ext
                    e_open = left - gap
                    e_new = jnp.maximum(e_ext, e_open)
                    f_ext = f_above - ext
                    f_open = top - gap
                    f_new = jnp.maximum(f_ext, f_open)
                    gap_best = jnp.maximum(e_new, f_new)
                else:
                    gap_best = jnp.maximum(top, left) - gap
                best = jnp.maximum(diag, gap_best)
                newval = jnp.maximum(best, 0) if local else best
                cur_next = jnp.where(started, newval, curs[r])

                if with_dirs:
                    is_diag = diag > gap_best
                    if affine:
                        gl, gt = e_new, f_new
                    else:
                        gl, gt = left, top
                    is_left = jnp.logical_and(
                        jnp.logical_not(is_diag), gl >= gt
                    )
                    d = jnp.where(
                        is_diag, 1, jnp.where(is_left, 0, 2)
                    ).astype(_INT)
                    if local:
                        d = jnp.where(best > 0, d, 3)
                    if isinstance(u, int):
                        words[r] = (
                            d if u == 0 else words[r] | (d << (2 * u))
                        )
                    else:  # traced step offset (split body)
                        words[r] = words[r] | (d << (2 * u))
                    if affine:
                        # Run-continuation bits: the oracle's traceback
                        # stays in a gap run iff extending strictly
                        # beats (re)opening from H (ties close the run,
                        # oracle.cpp sa_align_affine).
                        eb = (e_ext > e_open).astype(_INT)
                        fb = (f_ext > f_open).astype(_INT)
                        d2 = eb | (fb << 1)
                        if isinstance(u, int):
                            words2[r] = (
                                d2 if u == 0
                                else words2[r] | (d2 << (2 * u))
                            )
                        else:
                            words2[r] = words2[r] | (d2 << (2 * u))

                if affine:
                    evecs[r] = jnp.where(started, e_new, evecs[r])
                    f_next = jnp.where(started, f_new, f_above)

                if ckpt_every:
                    cks[r] = jnp.where(cmask, cur_next, cks[r])
                    if affine:
                        ckse[r] = jnp.where(cmask, evecs[r], ckse[r])

                if track:
                    # local: running max over all live cells; semi: over
                    # the last pattern row only (strict improvement keeps
                    # the first column on ties, both modes).
                    row_ok = (
                        ibase + r + 1 <= m if local else ibase + r + 1 == m
                    )
                    valid = jnp.logical_and(
                        started, jnp.logical_and(jvec <= n, row_ok)
                    )
                    cand = jnp.where(valid, newval, NEG_INF)
                    improved = cand > accs[r]
                    accs[r] = jnp.maximum(accs[r], cand)
                    ajs[r] = jnp.where(improved, jvec, ajs[r])
                else:
                    hit = jnp.logical_and(ibase + r + 1 == m, jvec == n)
                    snap = jnp.where(hit, newval, snap)

                # Next row's top = this row's new value; its diagonal =
                # this row's previous-step value.
                diag_src = curs[r]
                top = cur_next
                if affine:
                    f_above = f_next
                new_curs.append(cur_next)

            curs = new_curs
            topsh = nb_top
            # Bottom-row stream: last row of the last slot, collected
            # vectorially and flushed once per 128 steps.
            coll = jnp.where(
                pos_last, curs[rps - 1], pltpu.roll(coll, 127, axis=1)
            )
            if affine:
                flast = f_above  # last row's F after this step
                fcoll = jnp.where(
                    pos_last, flast, pltpu.roll(fcoll, 127, axis=1)
                )
        return (words, words2, curs, topsh, w, coll, accs, ajs, snap,
                cks, evecs, flast, fcoll, ckse)

    def word_fn(k16, carry):
        (curs, topsh, w, coll, accs, ajs, snap, cks,
         evecs, flast, fcoll, ckse) = carry
        words = [jnp.zeros((srows, 128), _INT)] * rps
        words2 = [jnp.zeros((srows, 128), _INT)] * rps
        state = (words, words2, curs, topsh, w, coll, accs, ajs, snap,
                 cks, evecs, flast, fcoll, ckse)
        if rps >= SPLIT_BODY_RPS:
            # Halved unrolled body inside a 2-trip loop: at rps >= 32
            # the fully unrolled 16-step body (16 x rps cells) crashes
            # the Mosaic backend (BENCH_NOTES rps=32 analysis).
            state = jax.lax.fori_loop(
                0, 2,
                lambda h, s: micro_steps(k16, h, unroll // 2, s),
                state,
            )
        else:
            state = micro_steps(k16, 0, unroll, state)
        (words, words2, curs, topsh, w, coll, accs, ajs, snap, cks,
         evecs, flast, fcoll, ckse) = state

        if with_dirs:
            for r in range(rps):
                dirs_ref[k16 * rps + r] = words[r]
                if affine:
                    dirs2_ref[k16 * rps + r] = words2[r]

        @pl.when(k16 % (128 // unroll) == (128 // unroll) - 1)
        def _flush_bottom():
            bot_out_ref[(k16 * unroll) // 128] = coll
            if affine:
                fbot_out_ref[(k16 * unroll) // 128] = fcoll

        if ckpt_every:
            # Column q*ckpt_every is fully captured once the last slot
            # has passed it (step q*ckpt_every + slots - 2); flush at the
            # end of the word group containing that step.  Safe because
            # the next checkpoint's capture window starts well after
            # (ckpt_every >= max(2048, 2*slots) enforced by the wrapper).
            t_last = g_blk * STEPS + k16 * unroll + (unroll - 1)
            rel = t_last - (slots - 2)

            @pl.when(
                jnp.logical_and(
                    rel >= ckpt_every, rel % ckpt_every < unroll
                )
            )
            def _flush_ckpt():
                idx = rel // ckpt_every - 1
                for r in range(rps):
                    ckpt_ref[idx * rps + r] = cks[r]
                    if affine:
                        ckpte_ref[idx * rps + r] = ckse[r]

        return (curs, topsh, w, coll, accs, ajs, snap, cks,
                evecs, flast, fcoll, ckse)

    curs0 = [cur_scr[r] for r in range(rps)]
    (curs, topsh, w, _, accs, ajs, snap, cks,
     evecs, flast, _, ckse) = jax.lax.fori_loop(
        0, STEPS // unroll, word_fn,
        (curs0, topsh_scr[:, :], w_scr[:, :], coll_scr[:, :],
         acc0, aj0, snap0, cks0, evec0, flast0, fcoll0, ckse0),
    )
    for r in range(rps):
        cur_scr[r] = curs[r]
    topsh_scr[:, :] = topsh
    w_scr[:, :] = w
    if track:
        for r in range(rps):
            acc_scr[r] = accs[r]
            aj_scr[r] = ajs[r]
    else:
        snap_scr[:, :] = snap
    if ckpt_every:
        for r in range(rps):
            ckpt_scr[r] = cks[r]
            if affine:
                ckpte_scr[r] = ckse[r]
    if affine:
        for r in range(rps):
            evec_scr[r] = evecs[r]
        flast_scr[:, :] = flast

    @pl.when(g_blk == num_blk - 1)
    def _finish():
        if track:
            for r in range(rps):
                rowmax_ref[r] = acc_scr[r]
                argj_ref[r] = aj_scr[r]
        else:
            snap_ref[:, :] = snap_scr[:, :]


def make_left_input(lc_full, rps: int, slots: int):
    """Slot-layout a left boundary column for wavefront_strip's left_in.

    lc_full: (rps*slots + 1,) int32 — lc_full[ri] = S[row_lo + ri, col_lo]
    for ri = 0..rows.  Returns (rps+1, slots/128, 128): entry (0, slot)
    is lc_full[rps*slot] (the neighbor-boundary / corner value) and
    entry (r+1, slot) is lc_full[rps*slot + r + 1] (the slot's own rows).
    """
    lc_full = jnp.asarray(lc_full, _INT)
    body = lc_full[1:].reshape(slots, rps).T          # (rps, slots)
    head = lc_full[:-1].reshape(slots, rps)[:, :1].T  # (1, slots)
    return jnp.concatenate([head, body], axis=0).reshape(
        rps + 1, slots // 128, 128
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_alpha", "local", "with_dirs", "rps", "ckpt_every", "slots",
        "semi", "affine", "interpret"
    ),
)
def wavefront_strip(text_steps, bottom_in, pattern_slots, score_matrix,
                    gap, n, m, i0, k_alpha: int, local: bool = False,
                    with_dirs: bool = True, rps: int = ROWS_PER_SLOT,
                    ckpt_every: int = 0, slots: int = SLOTS,
                    semi: bool = False, left_in=None,
                    affine: bool = False, ext=0, fbot_in=None,
                    left_e=None,
                    interpret: bool = False):
    """Run one (rps*slots)-row strip sweep.

    Args:
      text_steps: (num_blocks, STEPS) int32 — text[t] per step.
      bottom_in: (num_blocks, STEPS) int32 — strip's top boundary row:
        H[i0, t+1] per step (strip 0: -g*(t+1) / 0).
      pattern_slots: (rps, slots/128, 128) int32 — pattern letters; entry
        (r, su, la) is the letter of DP row i0 + rps*(su*128+la) + r + 1.
      gap, n, m, i0: scalars.
      slots: vector slots per strip (multiple of 128).  Wider slots
        amortize the sequential per-step row chain over more vector
        registers (4096 measures ~2x over 1024); the skewed direction
        format and its walkers take the same slots factor.
      left_in: optional (rps+1, slots/128, 128) int32 left boundary
        column in make_left_input layout — the strip then fills the
        sub-matrix starting at an arbitrary column col_lo whose left
        boundary S[i, col_lo] it encodes (bottom_in must then hold
        S[i0, col_lo+t+1]).  None = the arithmetic column-0 boundary.
        Used by the checkpointed engine to re-fill path tiles at
        wavefront speed.

    Returns (dirs, bottom_out, rowmax, argj, snap, ckpts):
      dirs: (num_blocks*STEPS/16*rps, 8, 128) skewed words — word
        (b, r, s) at flat index b*rps + r holds steps 16b..16b+15 of
        slot s's row r (dummy when with_dirs=False);
      bottom_out: (num_blocks, STEPS) — strip's last row value stream;
      rowmax/argj: (rps, 8, 128) per-row maxima / first best column;
      snap: (8, 128) holding S[m, n] (global);
      ckpts: (num_ckpts*rps, 8, 128) column checkpoints when
        ckpt_every > 0 (power of two, >= slots+16): entry (q*rps+r, su, la)
        holds S[i0 + rps*(su*128+la) + r + 1, (q+1)*ckpt_every] — used by
        the checkpointed long-pair engine (dummy (1, 8, 128) otherwise).
    """
    num_blocks, steps = text_steps.shape
    assert steps == STEPS
    assert slots % 128 == 0
    # Capture windows must not overlap: column q*C is in flight for
    # slots-1 steps and flushes within DIR_STEPS_PER_WORD-1 steps after,
    # so consecutive checkpoint columns need C >= slots + 16.
    assert ckpt_every == 0 or (
        ckpt_every >= slots + DIR_STEPS_PER_WORD
        and (ckpt_every & (ckpt_every - 1)) == 0
    ), "ckpt_every must be a power of two >= slots + 16"
    srows = slots // 128

    scal = jnp.stack(
        [jnp.asarray(x, _INT) for x in (gap, n, m, i0, ext)]
    ).reshape(1, 5)
    # Pack with traced ops (score_matrix may be a tracer under an outer
    # jit); the |score| <= 127 contract is validated at host entry
    # points via pack_score_matrix.
    n_planes = -(-k_alpha // 4)
    sm = pack_score_matrix_traced(score_matrix, k_alpha)

    # semi: NW recurrence/boundaries (pass local=False and an all-zero
    # strip-0 bottom_in) with local-style max tracking masked to the last
    # pattern row — score = first max of row m.
    assert not (semi and local)
    has_left = left_in is not None
    kernel = functools.partial(
        _wavefront_kernel, k_alpha, local, with_dirs, rps, ckpt_every,
        slots, semi, has_left, affine,
    )
    if ckpt_every:
        num_ckpts = max(1, (num_blocks * STEPS) // ckpt_every)
        ckpt_rows = num_ckpts * rps
        ckpt_scr_rows = rps
    else:
        ckpt_rows = 1
        ckpt_scr_rows = 1
    words_per_block = (STEPS // DIR_STEPS_PER_WORD) * rps
    if with_dirs:
        dirs_shape = (num_blocks * words_per_block, srows, 128)
        dirs_spec = pl.BlockSpec(
            (words_per_block, srows, 128), lambda g: (g, 0, 0)
        )
    else:
        dirs_shape = (1, srows, 128)
        dirs_spec = pl.BlockSpec((1, srows, 128), lambda g: (0, 0, 0))

    smem = lambda shape, idx: pl.BlockSpec(  # noqa: E731
        shape, idx, memory_space=pltpu.SMEM
    )
    vec = lambda: pl.BlockSpec((rps, srows, 128), lambda g: (0, 0, 0))  # noqa: E731

    in_specs = [
        smem((1, 5), lambda g: (0, 0)),
        smem((k_alpha, n_planes), lambda g: (0, 0)),
        smem((1, 1, STEPS), lambda g: (g, 0, 0)),
        smem((1, 1, STEPS), lambda g: (g, 0, 0)),
        vec(),
    ]
    inputs = [
        scal, sm,
        text_steps.astype(_INT).reshape(num_blocks, 1, STEPS),
        bottom_in.astype(_INT).reshape(num_blocks, 1, STEPS),
        pattern_slots.astype(_INT),
    ]
    if affine:
        in_specs.append(smem((1, 1, STEPS), lambda g: (g, 0, 0)))
        inputs.append(fbot_in.astype(_INT).reshape(num_blocks, 1, STEPS))
    if has_left:
        in_specs.append(
            pl.BlockSpec((rps + 1, srows, 128), lambda g: (0, 0, 0))
        )
        inputs.append(left_in.astype(_INT))
        if affine:
            in_specs.append(
                pl.BlockSpec((rps + 1, srows, 128), lambda g: (0, 0, 0))
            )
            inputs.append(left_e.astype(_INT))

    bot_spec = pl.BlockSpec((STEPS // 128, srows, 128), lambda g: (g, 0, 0))
    bot_shape = jax.ShapeDtypeStruct(
        (num_blocks * (STEPS // 128), srows, 128), _INT
    )
    ckpt_spec = pl.BlockSpec((ckpt_rows, srows, 128), lambda g: (0, 0, 0))
    ckpt_shape = jax.ShapeDtypeStruct((ckpt_rows, srows, 128), _INT)
    out_specs = [dirs_spec]
    out_shapes = [jax.ShapeDtypeStruct(dirs_shape, _INT)]
    if affine:
        out_specs.append(dirs_spec)
        out_shapes.append(jax.ShapeDtypeStruct(dirs_shape, _INT))
    out_specs.append(bot_spec)
    out_shapes.append(bot_shape)
    if affine:
        out_specs.append(bot_spec)
        out_shapes.append(bot_shape)
    out_specs += [
        vec(), vec(), pl.BlockSpec((srows, 128), lambda g: (0, 0)),
        ckpt_spec,
    ]
    out_shapes += [
        jax.ShapeDtypeStruct((rps, srows, 128), _INT),
        jax.ShapeDtypeStruct((rps, srows, 128), _INT),
        jax.ShapeDtypeStruct((srows, 128), _INT),
        ckpt_shape,
    ]
    if affine:
        out_specs.append(ckpt_spec)
        out_shapes.append(ckpt_shape)
    scratch_shapes = [
        pltpu.VMEM((rps, srows, 128), _INT),   # cur
        pltpu.VMEM((srows, 128), _INT),        # topsh
        pltpu.VMEM((srows, 128), _INT),        # w
        pltpu.VMEM((rps, srows, 128), _INT),   # acc
        pltpu.VMEM((rps, srows, 128), _INT),   # aj
        pltpu.VMEM((srows, 128), _INT),        # snap
        pltpu.VMEM((srows, 128), _INT),        # coll
        pltpu.VMEM((rps * n_planes, srows, 128), _INT),  # coef
        pltpu.VMEM((ckpt_scr_rows, srows, 128), _INT),   # ckpt
    ]
    if affine:
        scratch_shapes += [
            pltpu.VMEM((rps, srows, 128), _INT),           # evec
            pltpu.VMEM((srows, 128), _INT),                # flast
            pltpu.VMEM((srows, 128), _INT),                # fcoll
            pltpu.VMEM((ckpt_scr_rows, srows, 128), _INT),  # ckpt_e
        ]

    outs = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch_shapes,
        # Deep geometries (rps=16) with protein coefficient planes and
        # dirs blocks exceed the compiler's default 16 MiB scoped-VMEM
        # cap (~29 MiB measured for local+protein); lift it like the
        # batch kernel does.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*inputs)
    outs = list(outs)
    dirs = outs.pop(0)
    dirs2 = outs.pop(0) if affine else None
    bot_out = outs.pop(0)
    fbot_out = outs.pop(0) if affine else None
    rowmax, argj, snap, ckpts = outs[:4]
    ckpts_e = outs[4] if affine else None

    def stream(x):
        return x[:, srows - 1, :].reshape(num_blocks, STEPS)

    base = (dirs, stream(bot_out), rowmax, argj, snap, ckpts)
    if not affine:
        return base
    return base + (dirs2, stream(fbot_out), ckpts_e)


def merge_local_best(rowmaxs, argjs, rows: int, rps: int, m: int,
                     slots: int = SLOTS):
    """Merge per-row SW maxima in DP-row order: max value, smallest row
    on ties (argj already holds the first column within a row) — the
    reference's row-major first-occurrence rule
    (alignSequenceCPU.cpp:191-192).  Vectorized; i is a bijection of
    (strip, slot, r) so the min-i tie-break is exact.

    rowmaxs/argjs: lists of (rps, slots) np arrays, one per strip.
    Returns (best, best_i, best_j) with the reference's 0/0/0 floor.
    """
    num_strips = len(rowmaxs)
    rm_all = np.stack(rowmaxs)    # (strips, rps, slots)
    aj_all = np.stack(argjs)
    c_idx, r_idx, s_idx = np.meshgrid(
        np.arange(num_strips), np.arange(rps), np.arange(slots),
        indexing="ij",
    )
    i_all = c_idx * rows + rps * s_idx + r_idx + 1
    valid = i_all <= m
    v_all = np.where(valid, rm_all, NEG_INF)
    best = int(v_all.max(initial=NEG_INF))
    if best <= 0:
        return 0, 0, 0
    ties = v_all == best
    flat = np.where(ties.reshape(-1), i_all.reshape(-1), 1 << 62)
    win = int(flat.argmin())
    return best, int(i_all.reshape(-1)[win]), int(aj_all.reshape(-1)[win])


def wavefront_fill(text, pattern, score_matrix, k_alpha: int, gap: int,
                   local: bool = False, with_dirs: bool = True,
                   rps: int = ROWS_PER_SLOT, slots: int = SLOTS,
                   interpret: bool = False):
    """Full single-pair fill via (rps*slots)-row wavefront strips.

    Returns (score, best_i, best_j, words, steps_pad) where words is the
    host-assembled skewed direction matrix, shape
    (num_strips, steps_pad/16 * rps, 1024), or None (with_dirs pins
    slots to 1024; score-only callers may widen slots for throughput).
    """
    text_np = np.asarray(text, dtype=np.int32)
    pattern_np = np.asarray(pattern, dtype=np.int32)
    sm = np.asarray(score_matrix, dtype=np.int32)
    pack_score_matrix(sm, k_alpha)  # validate the |score| <= 127 contract
    n, m = text_np.shape[0], pattern_np.shape[0]
    gap = int(gap)
    rows = rps * slots

    num_strips = max(1, -(-m // rows))
    total_steps = n + slots - 1
    steps_pad = -(-total_steps // STEPS) * STEPS
    num_blocks = steps_pad // STEPS

    text_steps = np.zeros(steps_pad, dtype=np.int32)
    text_steps[:n] = text_np
    text_steps = text_steps.reshape(num_blocks, STEPS)

    pat_pad = np.zeros(num_strips * rows, dtype=np.int32)
    pat_pad[:m] = pattern_np

    if local:
        bottom = np.zeros(steps_pad, dtype=np.int32)
    else:
        bottom = (-gap * (np.arange(steps_pad, dtype=np.int64) + 1)).astype(
            np.int32
        )
    bottom = jnp.asarray(bottom.reshape(num_blocks, STEPS))

    words = (
        np.empty(
            (num_strips, (steps_pad // DIR_STEPS_PER_WORD) * rps, slots),
            dtype=np.int32,
        )
        if with_dirs
        else None
    )
    rowmaxs, argjs, snaps = [], [], []
    ts_dev = jnp.asarray(text_steps)
    for c in range(num_strips):
        i0 = c * rows
        # pattern_slots[r, su, la] = pattern letter of row i0+rps*slot+r+1.
        chunk = pat_pad[i0 : i0 + rows].reshape(slots, rps)
        pat_slots = jnp.asarray(
            np.ascontiguousarray(chunk.T).reshape(rps, slots // 128, 128)
        )
        dirs, bot_out, rowmax, argj, snap, _ = wavefront_strip(
            ts_dev, bottom, pat_slots, sm, gap, n, m, i0,
            k_alpha=k_alpha, local=local, with_dirs=with_dirs, rps=rps,
            slots=slots, interpret=interpret,
        )
        if with_dirs:
            w = np.asarray(jax.device_get(dirs))
            words[c] = w.reshape(w.shape[0], slots)
        rowmaxs.append(np.asarray(jax.device_get(rowmax)).reshape(rps, slots))
        argjs.append(np.asarray(jax.device_get(argj)).reshape(rps, slots))
        snaps.append(np.asarray(jax.device_get(snap)).reshape(-1))
        if c + 1 < num_strips:
            flat = jnp.reshape(bot_out, (-1,))
            shifted = jnp.concatenate(
                [flat[slots - 1 :], jnp.zeros((slots - 1,), _INT)]
            )
            bottom = shifted.reshape(num_blocks, STEPS)

    if local:
        best, bi, bj = merge_local_best(
            rowmaxs, argjs, rows, rps, m, slots=slots
        )
        return best, bi, bj, words, steps_pad

    # snap holds S[m, n] at the slot owning row m.
    strip = (m - 1) // rows
    slot_idx = ((m - 1) % rows) // rps
    score = int(snaps[strip][slot_idx])
    return score, m, n, words, steps_pad
