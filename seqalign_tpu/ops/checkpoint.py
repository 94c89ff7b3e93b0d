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
  m/strip_rows) tiles the optimal path crosses — with the *same*
  wavefront kernel, seeded from the saved boundaries through its
  left-boundary-column input (wavefront.make_left_input) — and walks
  each tile on device in the same dispatch, so only the O(n+m) move
  list ever crosses the host link.

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
from .pallas_walk import pallas_walk_skewed_window, unpack_moves
from .traceback import (
    device_walk_affine_skewed_window,
    device_walk_skewed_window,
    emit_moves_affine,
)

_INT = jnp.int32
_LEFT, _DIAG, _TOP, _STOP = 0, 1, 2, 3

DEFAULT_CKPT_COLS = 32768  # column-checkpoint spacing (= re-fill tile width)
# Phase-1 wavefront geometry: 4096 vector slots, rows-per-slot picked by
# pattern length.  Deeper strips amortize the sequential per-step row
# chain over more rows: with-dirs GCUPS measured 75.4 (rps=4, 16384-row
# strips) vs 134.7 (rps=16, 65536-row strips) on protein 32768-wide
# sweeps (scripts/sweep_wavefront_geometry.py).  rps=32 compiles since
# the round-4 split body but gains only ~4.5% at slots=2048 and loses
# at slots=4096 (bench/results/r4_geometry_sweep.out) — not default.
# Short patterns stay at rps=4 so strip padding doesn't eat the gain.
DEFAULT_CKPT_RPS = 4
DEFAULT_CKPT_SLOTS = 4096
DEEP_CKPT_RPS = 16
DEEP_CKPT_MIN_ROWS = 36864  # break-even m between the two geometries


def _pick_geometry(m: int, rps, slots):
    if rps is not None or slots is not None:
        return rps or DEFAULT_CKPT_RPS, slots or DEFAULT_CKPT_SLOTS
    if m >= DEEP_CKPT_MIN_ROWS:
        return DEEP_CKPT_RPS, DEFAULT_CKPT_SLOTS
    return DEFAULT_CKPT_RPS, DEFAULT_CKPT_SLOTS


@dataclasses.dataclass
class CheckpointedFill:
    """Score + boundary checkpoints of a wavefront score-only fill.

    colvals[b]: (num_ckpts, rows) device — S[i, (q+1)*ckpt_cols] for the
      rows of wavefront strip b (row i = b*rows + ri + 1 at index ri).
    boundaries[b]: (steps_pad,) device — S[(b+1)*rows, j] at index j-1.
    Affine mode (gap_extend set) additionally keeps the same layouts for
    the E gap state's columns (colvals_e) and the F gap state's bottom
    rows (boundaries_f) — the extra boundary state a Gotoh tile re-fill
    needs.
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
    gap_extend: int | None = None
    colvals_e: list | None = None
    boundaries_f: list | None = None


def checkpointed_fill(text, pattern, score_matrix, k_alpha: int, gap: int,
                      local: bool = False, semi: bool = False,
                      gap_extend: int | None = None,
                      ckpt_cols: int = DEFAULT_CKPT_COLS,
                      rps: int | None = None,
                      slots: int | None = None) -> CheckpointedFill:
    """Score-only wavefront fill keeping tile boundary checkpoints on
    device (the strip loop mirrors wavefront.wavefront_fill).

    gap_extend: affine (Gotoh) mode — ``gap`` is then the open cost and
    a run of length L costs gap + (L-1)*gap_extend, matching the native
    oracle's sa_align_affine (extension; the reference is linear-only).
    """
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
    rps, slots = _pick_geometry(m, rps, slots)
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

    affine = gap_extend is not None
    ext = int(gap_extend) if affine else 0
    if local or semi:
        # Semi-global: H[0, j] = 0 like local; interior recurrence and
        # the H[i, 0] column stay NW-style.
        bottom = jnp.zeros((num_blocks, wavefront.STEPS), _INT)
    elif affine:
        # Affine row boundary: H[0, j] = -(open + (j-1)*extend).
        bottom = jnp.asarray(
            (-gap - ext * np.arange(steps_pad, dtype=np.int64))
            .astype(np.int32)
            .reshape(num_blocks, wavefront.STEPS)
        )
    else:
        bottom = jnp.asarray(
            (-gap * (np.arange(steps_pad, dtype=np.int64) + 1))
            .astype(np.int32)
            .reshape(num_blocks, wavefront.STEPS)
        )
    fbottom = (
        jnp.full((num_blocks, wavefront.STEPS), wavefront.NEG_HALF, _INT)
        if affine
        else None
    )

    def ckpts_to_cols(ckpts):
        # (num_ckpts*rps, slots/128, 128) -> (num_ckpts, rows) with row
        # index ri = rps*slot + r.
        num_ckpts = ckpts.shape[0] // rps
        return (
            ckpts.reshape(num_ckpts, rps, slots)
            .transpose(0, 2, 1)
            .reshape(num_ckpts, rows)
        )

    def to_boundary(bot_out):
        # Bottom boundary row: value S[i0+rows, j] at flat index j-1,
        # padded so phase-2 tile slices up to ceil(n/ckpt_cols)*ckpt_cols
        # stay in bounds (pad values feed only j > n cells, never read).
        flat = jnp.reshape(bot_out, (-1,))
        shifted = jnp.concatenate(
            [flat[slots - 1 :], jnp.zeros((slots - 1,), _INT)]
        )
        pad = -(-steps_pad // ckpt_cols) * ckpt_cols - steps_pad
        padded = (
            jnp.concatenate([shifted, jnp.zeros((pad,), _INT)])
            if pad
            else shifted
        )
        return shifted, padded

    colvals, boundaries, rowmaxs, argjs, snaps = [], [], [], [], []
    colvals_e, boundaries_f = [], []
    for b in range(num_strips):
        i0 = b * rows
        chunk = pat_pad[i0 : i0 + rows].reshape(slots, rps)
        pat_slots = jnp.asarray(
            np.ascontiguousarray(chunk.T).reshape(rps, slots // 128, 128)
        )
        outs = wavefront.wavefront_strip(
            ts_dev, bottom, pat_slots, sm, gap, n, m, i0,
            k_alpha=k_alpha, local=local, with_dirs=False, rps=rps,
            ckpt_every=ckpt_cols, slots=slots, semi=semi,
            affine=affine, ext=ext, fbot_in=fbottom,
            interpret=interpret,
        )
        _, bot_out, rowmax, argj, snap, ckpts = outs[:6]
        colvals.append(ckpts_to_cols(ckpts))
        # Keep device handles; one batched fetch after the strip loop
        # avoids a host sync (tunnel round trip) per strip.
        rowmaxs.append(rowmax)
        argjs.append(argj)
        snaps.append(snap)
        shifted, padded = to_boundary(bot_out)
        boundaries.append(padded)
        if affine:
            _, fbot_out, ckpts_e = outs[6:]
            colvals_e.append(ckpts_to_cols(ckpts_e))
            fshifted, fpadded = to_boundary(fbot_out)
            boundaries_f.append(fpadded)
            if b + 1 < num_strips:
                fbottom = fshifted.reshape(num_blocks, wavefront.STEPS)
        if b + 1 < num_strips:
            bottom = shifted.reshape(num_blocks, wavefront.STEPS)

    rowmaxs, argjs, snaps = jax.device_get((rowmaxs, argjs, snaps))
    rowmaxs = [np.asarray(x).reshape(rps, -1) for x in rowmaxs]
    argjs = [np.asarray(x).reshape(rps, -1) for x in argjs]
    extra = (
        dict(
            gap_extend=ext, colvals_e=colvals_e,
            boundaries_f=boundaries_f,
        )
        if affine
        else {}
    )
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
        gap=gap, local=local, semi=semi, **extra,
    )


def _tile_body(text_pad, pats_all, colvals_all, bounds_all,
               colvalse_all, boundsf_all, sm,
               gap, ext, b, c, i, j, wstate, k_alpha: int,
               local: bool,
               semi: bool, affine: bool, rps: int, slots: int,
               ckpt_cols: int,
               tile_blocks: int, max_moves: int,
               interpret: bool = False):
    """Gather tile (c, b)'s boundary inputs from the saved
    checkpoints, re-fill its direction words with the *wavefront* kernel
    (left-boundary-column variant — ~13x the strip kernel this replaced)
    and walk them on device; only the move list returns to the host.

    All tile coordinates are traced, so a single compilation serves every
    tile of a traceback.  Array layouts:
      text_pad: (L,) — text letters, zero-padded to
        (num_col_tiles-1)*ckpt_cols + tile_blocks*STEPS.
      pats_all: (num_strips, rps, slots/128, 128) — phase-1 pattern slots.
      colvals_all: (num_strips, num_ckpts, rows) — column checkpoints,
        entry (b, q, ri) = S[b*rows + ri + 1, (q+1)*ckpt_cols].
      bounds_all: (num_strips, L) — bottom boundary rows, entry (b, t) =
        S[(b+1)*rows, t+1].
    """
    rows = rps * slots
    tile_steps = tile_blocks * wavefront.STEPS
    row_lo = b * rows
    col_lo = c * ckpt_cols
    gap = jnp.asarray(gap, _INT)
    ext = jnp.asarray(ext, _INT)

    # Top boundary row S[row_lo, col_lo + t + 1] per sweep step t.
    tvec = jnp.arange(tile_steps, dtype=_INT)
    if local or semi:
        arith_bot = jnp.zeros((tile_steps,), _INT)
    elif affine:
        arith_bot = -(gap + ext * (col_lo + tvec))
    else:
        arith_bot = -(gap * (col_lo + tvec + 1))
    stored_bot = jax.lax.dynamic_slice(
        bounds_all, (jnp.maximum(b - 1, 0), col_lo), (1, tile_steps)
    )[0]
    bot = jnp.where(b == 0, arith_bot, stored_bot)

    # Left boundary column S[row_lo + ri, col_lo], ri = 0..rows.
    rvec = jnp.arange(rows, dtype=_INT)
    if local:
        arith_col = jnp.zeros((rows,), _INT)
    elif affine:
        arith_col = -(gap + ext * (row_lo + rvec))
    else:
        arith_col = -(gap * (row_lo + rvec + 1))
    stored_col = jax.lax.dynamic_slice(
        colvals_all, (b, jnp.maximum(c - 1, 0), 0), (1, 1, rows)
    ).reshape(rows)
    body = jnp.where(c == 0, arith_col, stored_col)
    if affine:
        zero = jnp.asarray(0, _INT)
        corner_c0 = jnp.where(
            jnp.logical_or(local, row_lo == 0),
            zero,
            -(gap + ext * (row_lo - 1)),
        )
        corner_b0 = jnp.where(
            jnp.logical_or(local, semi), zero,
            -(gap + ext * (col_lo - 1)),
        )
    else:
        corner_c0 = jnp.asarray(0 if local else -1, _INT) * gap * row_lo
        corner_b0 = (
            jnp.asarray(0 if (local or semi) else -1, _INT) * gap * col_lo
        )
    stored_corner = jax.lax.dynamic_slice(
        bounds_all,
        (jnp.maximum(b - 1, 0), jnp.maximum(col_lo - 1, 0)),
        (1, 1),
    ).reshape(())
    corner = jnp.where(
        c == 0, corner_c0, jnp.where(b == 0, corner_b0, stored_corner)
    )
    left_in = wavefront.make_left_input(
        jnp.concatenate([corner.reshape(1), body]), rps, slots
    )

    if affine:
        # F top boundary row and E left boundary column (the Gotoh gap
        # states' own checkpoints; arithmetic boundaries are -inf).
        neg = jnp.full((tile_steps,), wavefront.NEG_HALF, _INT)
        stored_fbot = jax.lax.dynamic_slice(
            boundsf_all, (jnp.maximum(b - 1, 0), col_lo), (1, tile_steps)
        )[0]
        fbot = jnp.where(b == 0, neg, stored_fbot)
        stored_ecol = jax.lax.dynamic_slice(
            colvalse_all, (b, jnp.maximum(c - 1, 0), 0), (1, 1, rows)
        ).reshape(rows)
        ebody = jnp.where(
            c == 0, jnp.full((rows,), wavefront.NEG_HALF, _INT),
            stored_ecol,
        )
        left_e = wavefront.make_left_input(
            jnp.concatenate(
                [jnp.full((1,), wavefront.NEG_HALF, _INT), ebody]
            ),
            rps, slots,
        )
    else:
        fbot = None
        left_e = None

    ts = jax.lax.dynamic_slice(text_pad, (col_lo,), (tile_steps,))
    pat_slots = jax.lax.dynamic_slice(
        pats_all, (b, 0, 0, 0), (1, rps, slots // 128, 128)
    )[0]
    # n/m feed only the (ignored) best-cell trackers here; semi tiles
    # fill with the plain NW recurrence (the modes differ only in
    # boundaries and tracking).
    outs = wavefront.wavefront_strip(
        ts.reshape(tile_blocks, wavefront.STEPS),
        bot.reshape(tile_blocks, wavefront.STEPS),
        pat_slots, sm, gap, tile_steps, rows, row_lo,
        k_alpha=k_alpha, local=local, with_dirs=True, rps=rps,
        slots=slots, left_in=left_in,
        affine=affine, ext=ext,
        fbot_in=(
            fbot.reshape(tile_blocks, wavefront.STEPS) if affine else None
        ),
        left_e=left_e, interpret=interpret,
    )
    dirs = outs[0]
    if not interpret:
        # In-kernel Pallas walker (~150 ns/step vs ~1.7 us for the XLA
        # gather walk); moves come back packed 16-per-int32.
        return pallas_walk_skewed_window(
            dirs, outs[6] if affine else None, rps, row_lo, col_lo,
            i, j, wstate, local, affine, max_moves,
        )
    if affine:
        return device_walk_affine_skewed_window(
            dirs, outs[6], rps, row_lo, col_lo, i, j, wstate, local,
            max_moves,
        )
    out, k, i2, j2, done = device_walk_skewed_window(
        dirs, rps, row_lo, col_lo, i, j, local, max_moves
    )
    return out, k, i2, j2, jnp.asarray(0, _INT), done


_TILE_STATICS = (
    "k_alpha", "local", "semi", "affine", "rps", "slots", "ckpt_cols",
    "tile_blocks", "max_moves", "interpret",
)

# Per-tile dispatch (interpreter-mode path; compiled runs use the
# single-dispatch device loop below).
_tile_refill_walk = functools.partial(
    jax.jit, static_argnames=_TILE_STATICS
)(_tile_body)


@functools.partial(
    jax.jit, static_argnames=_TILE_STATICS + ("moves_cap",)
)
def _traceback_device_loop(text_pad, pats_all, colvals_all, bounds_all,
                           colvalse_all, boundsf_all, sm,
                           gap, ext, i0, j0, st0, k_alpha: int,
                           local: bool, semi: bool, affine: bool,
                           rps: int, slots: int, ckpt_cols: int,
                           tile_blocks: int, max_moves: int,
                           moves_cap: int,
                           interpret: bool = False):
    """The WHOLE phase-2 traceback in one dispatch: a lax.while_loop
    re-fills and walks one path tile per iteration (wavefront kernel +
    in-kernel Pallas walker), appending each tile's moves to a device
    buffer.  Only the final 2-bit-packed move list crosses the host
    link — no per-tile round trips (~24 ms each through the tunnel).

    Returns (packed2, k_total, i, j, state): packed2 is
    (moves_cap/16,) int32 with move p at bits 2(p%16) of word p//16.
    """
    rows = rps * slots
    idx = jnp.arange(max_moves, dtype=_INT)

    def cond(state):
        i, j, st, ktot, done, buf = state
        return jnp.logical_and(
            jnp.logical_not(done), jnp.logical_and(i > 0, j > 0)
        )

    def body(state):
        i, j, st, ktot, done, buf = state
        b = (i - 1) // rows
        c = (j - 1) // ckpt_cols
        packed, k, i2, j2, st2, tdone = _tile_body(
            text_pad, pats_all, colvals_all, bounds_all,
            colvalse_all, boundsf_all, sm, gap, ext, b, c, i, j, st,
            k_alpha=k_alpha, local=local, semi=semi, affine=affine,
            rps=rps, slots=slots, ckpt_cols=ckpt_cols,
            tile_blocks=tile_blocks, max_moves=max_moves,
            interpret=interpret,
        )
        unpacked = (packed[idx // 16] >> (2 * (idx % 16))) & 3
        unpacked = jnp.where(idx < k, unpacked, 0)
        buf = jax.lax.dynamic_update_slice(buf, unpacked, (ktot,))
        done = tdone if local else jnp.asarray(False)
        return (i2, j2, st2, ktot + k, done, buf)

    buf0 = jnp.zeros((moves_cap,), _INT)
    i, j, st, ktot, done, buf = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(i0, _INT), jnp.asarray(j0, _INT),
         jnp.asarray(st0, _INT), jnp.asarray(0, _INT),
         jnp.asarray(False), buf0),
    )
    # 2-bit-pack the move buffer for the trip home (4 KB per 16k moves).
    packed2 = (
        (buf.reshape(-1, 16) << (2 * jnp.arange(16, dtype=_INT)))
        .sum(axis=1)
        .astype(_INT)
    )
    return packed2, ktot, i, j, st


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
    rps = ck.rps
    slots = ck.rows // rps
    num_strips = len(ck.colvals)
    num_col_tiles = max(1, -(-ck.n // ck.ckpt_cols))
    tile_blocks = -(-(ck.ckpt_cols + slots - 1) // wavefront.STEPS)
    tile_steps = tile_blocks * wavefront.STEPS

    # Stack the phase-1 boundary handles into single device arrays so
    # every tile is one dynamic_slice inside the jitted re-fill+walk.
    l_pad = (num_col_tiles - 1) * ck.ckpt_cols + tile_steps
    text_pad = np.zeros(l_pad, dtype=np.int32)
    text_pad[: ck.n] = text_np
    text_pad = jnp.asarray(text_pad)
    bounds = jnp.stack(ck.boundaries)
    if bounds.shape[1] < l_pad:
        bounds = jnp.pad(bounds, ((0, 0), (0, l_pad - bounds.shape[1])))
    colvals_all = jnp.stack(ck.colvals)
    pat_pad = np.zeros(num_strips * ck.rows, dtype=np.int32)
    pat_pad[: ck.m] = pattern_np
    pats_all = jnp.asarray(
        np.ascontiguousarray(
            pat_pad.reshape(num_strips, slots, rps).transpose(0, 2, 1)
        ).reshape(num_strips, rps, slots // 128, 128)
    )
    sm_dev = jnp.asarray(sm)
    interpret = config.pallas_interpret()
    affine = ck.gap_extend is not None
    if affine:
        colvalse_all = jnp.stack(ck.colvals_e)
        boundsf_all = jnp.stack(ck.boundaries_f)
        if boundsf_all.shape[1] < l_pad:
            boundsf_all = jnp.pad(
                boundsf_all, ((0, 0), (0, l_pad - boundsf_all.shape[1]))
            )
        ext = ck.gap_extend
    else:
        # Unused dummies keeping the traced signature uniform.
        colvalse_all = jnp.zeros((num_strips, 1, ck.rows), _INT)
        boundsf_all = jnp.zeros((num_strips, l_pad), _INT)
        ext = 0

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
    moves_parts = []
    start_i, start_j = i, j
    wstate = 0  # affine walk state (H/E-run/F-run), carried across tiles

    if not interpret and not done:
        # Compiled path: the whole tile loop runs on device in one
        # dispatch (no per-tile host round trips).
        moves_cap = -(-(ck.m + ck.n + max_moves + 1) // 16) * 16
        packed2, ktot, i_d, j_d, st_d = _traceback_device_loop(
            text_pad, pats_all, colvals_all, bounds,
            colvalse_all, boundsf_all, sm_dev, ck.gap, ext,
            i, j, wstate, k_alpha=k_alpha, local=local,
            semi=ck.semi, affine=affine,
            rps=rps, slots=slots, ckpt_cols=ck.ckpt_cols,
            tile_blocks=tile_blocks, max_moves=max_moves,
            moves_cap=moves_cap, interpret=interpret,
        )
        ktot = int(ktot)
        moves_parts.append(
            unpack_moves(np.asarray(jax.device_get(packed2)), ktot)
        )
        i, j = int(i_d), int(j_d)
        done = True

    while not done:
        if not local and (i == 0 or j == 0):
            break
        c = (j - 1) // ck.ckpt_cols
        b = (i - 1) // ck.rows
        out, k, i_d, j_d, st_d, done_d = _tile_refill_walk(
            text_pad, pats_all, colvals_all, bounds,
            colvalse_all, boundsf_all, sm_dev, ck.gap, ext,
            b, c, i, j, wstate, k_alpha=k_alpha, local=local,
            semi=ck.semi, affine=affine,
            rps=rps, slots=slots, ckpt_cols=ck.ckpt_cols,
            tile_blocks=tile_blocks, max_moves=max_moves,
            interpret=interpret,
        )
        k = int(k)
        wstate = int(st_d)
        mv = np.asarray(jax.device_get(out))[:k].astype(np.uint8)
        i, j, tile_done = int(i_d), int(j_d), bool(done_d)
        moves_parts.append(mv)
        if local:
            done = tile_done
        elif ck.semi:
            done = i == 0
        else:
            done = i == 0 and j == 0

    if not local and (i == 0 or j == 0) and not (i == 0 and j == 0):
        # Forced first-row/column moves (alignSequenceCPU.cpp:77-81;
        # j == 0 forces TOP before i == 0 forces LEFT; the affine
        # oracle resets any gap-run state at the edges the same way).
        # Semi-global stops at row 0 without emitting the free text
        # end-gap.
        if j == 0 and i > 0:
            moves_parts.append(np.full(i, _TOP, np.uint8))
        elif i == 0 and j > 0 and not ck.semi:
            moves_parts.append(np.full(j, _LEFT, np.uint8))

    moves = (
        np.concatenate(moves_parts)
        if moves_parts
        else np.zeros(0, np.uint8)
    )
    if affine:
        # Affine emission has no cursor quirks (sa_align_affine): chars
        # come straight off the walk cursor; offsets = final (j, i).
        at, ap, st, sp = emit_moves_affine(
            moves, start_i, start_j, text_np, pattern_np, k_alpha
        )
    else:
        at, ap, st, sp = bindings.emit_moves(
            moves, start_i, start_j, local, text_np, pattern_np, k_alpha
        )
    if ck.semi:
        # Fit-alignment offsets: where the pattern lands in the text.
        st, sp = j, 0
    return at, ap, st, sp


def checkpointed_align(text, pattern, score_matrix, k_alpha: int, gap: int,
                       local: bool = False, semi: bool = False,
                       gap_extend: int | None = None,
                       ckpt_cols: int = DEFAULT_CKPT_COLS,
                       rps: int | None = None,
                       slots: int | None = None):
    """Full alignment of an arbitrarily long pair in O(boundary) memory.

    Returns (score, best_i, best_j, aligned_text_idx, aligned_pattern_idx,
    start_text, start_pattern).  gap_extend switches to affine (Gotoh)
    gap costs, byte-identical to the native sa_align_affine.
    """
    ck = checkpointed_fill(
        text, pattern, score_matrix, k_alpha, gap,
        local=local, semi=semi, gap_extend=gap_extend,
        ckpt_cols=ckpt_cols, rps=rps, slots=slots,
    )
    at, ap, st, sp = checkpointed_traceback(
        ck, text, pattern, score_matrix, k_alpha
    )
    return ck.score, ck.best_i, ck.best_j, at, ap, st, sp
