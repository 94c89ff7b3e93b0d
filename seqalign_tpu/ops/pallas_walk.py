"""In-kernel Pallas traceback walker over skewed direction words.

The XLA window walkers (ops/traceback.py) pay an HBM gather round-trip
per DP step (~1.7 us measured); this kernel DMAs a rolling window of
word rows into VMEM and chases the path with in-VMEM scalar reads
(~150 ns/step measured, scripts/probe_walk_costs.py) — an order of
magnitude on the long-pair traceback walk.  The reference's analog
walks a pinned-host byte matrix on the CPU (alignSequenceGPU.cu:631-648).

Layout recap (ops/wavefront.py): word row (t//16)*rps + r of a
(W, slots/128, 128) array holds sweep steps 16(t//16)..16(t//16)+15 of
slot s's in-slot row r; the walk's sweep step t = j - 1 + slot is
non-increasing (each move decreases it by 0..2), so the VMEM window
rolls monotonically toward t = 0 and each window of G word groups
serves >= 8*(G-1) moves.

Moves are packed 16-per-int32 into an SMEM output; semantics are
bit-identical to device_walk_skewed_window / sa_walk_skewed_window
(linear) and device_walk_affine_skewed_window (affine), which remain
the interpreter-mode and parity oracles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INT = jnp.int32
_LEFT, _DIAG, _TOP, _STOP = 0, 1, 2, 3
WINDOW_GROUPS = 8  # 16-step word groups resident in VMEM per reload


def _walker_kernel(rps: int, srows: int, groups: int, local: bool,
                   affine: bool,
                   scal_ref, *refs):
    refs = list(refs)
    words_hbm = refs.pop(0)
    words2_hbm = refs.pop(0) if affine else None
    mv_ref = refs.pop(0)
    res_ref = refs.pop(0)
    win_scr = refs.pop(0)
    win2_scr = refs.pop(0) if affine else None
    acc_scr = refs.pop(0)
    sem = refs.pop(0)
    sem2 = refs.pop(0) if affine else None

    row_lo = scal_ref[0, 0]
    col_lo = scal_ref[0, 1]
    i_start = scal_ref[0, 2]
    j_start = scal_ref[0, 3]
    st_start = scal_ref[0, 4]
    lane = jax.lax.broadcasted_iota(_INT, (1, 1, 128), 2)
    lane_row = jax.lax.broadcasted_iota(_INT, (1, 128), 1)

    def stash_word(kw, mvw):
        # Move words go to a VMEM (rows, 128) output — not SMEM, whose
        # few-KB budget capped the one-dispatch engine at ~131k moves:
        # words accumulate into a (1, 128) lane vector (one select per
        # 16 moves) and flush as full rows (one dynamic-sublane store
        # per 2048 moves).
        acc_scr[0:1, :] = jnp.where(
            lane_row == kw % 128, mvw, acc_scr[0:1, :]
        )

        @pl.when(kw % 128 == 127)
        def _store_row():
            mv_ref[pl.ds(kw // 128, 1), :] = acc_scr[0:1, :]

    def read(win, grow, su, la):
        # Mosaic has no dynamic-lane scalar load: load the (1, 1, 128)
        # row and extract the lane with a masked reduce (~150 ns total
        # per chased step, scripts/probe_walk_costs.py).
        row = win[pl.ds(grow, 1), pl.ds(su, 1), :]
        return jnp.sum(jnp.where(lane == la, row, 0))

    def group_of(i, j):
        # Word group b = t // 16 of tile-local cell (i, j).
        slot = (i - row_lo - 1) // rps
        t = (j - col_lo - 1) + slot
        return t >> 4

    def inside(i, j, done):
        return jnp.logical_and(
            jnp.logical_not(done),
            jnp.logical_and(i > row_lo, j > col_lo),
        )

    def outer_cond(state):
        i, j, st, k, mvw, done = state
        return inside(i, j, done)

    def outer_body(state):
        i, j, st, k, mvw, done = state
        b_hi = group_of(i, j)
        b_lo = jnp.maximum(b_hi - (groups - 1), 0)
        copy = pltpu.make_async_copy(
            words_hbm.at[pl.ds(b_lo * rps, groups * rps)],
            win_scr, sem,
        )
        copy.start()
        if affine:
            copy2 = pltpu.make_async_copy(
                words2_hbm.at[pl.ds(b_lo * rps, groups * rps)],
                win2_scr, sem2,
            )
            copy2.start()
            copy2.wait()
        copy.wait()

        def inner_cond(state):
            i, j, st, k, mvw, done = state
            return jnp.logical_and(
                inside(i, j, done), group_of(i, j) >= b_lo
            )

        def inner_body(state):
            i, j, st, k, mvw, done = state
            il = i - row_lo
            jl = j - col_lo
            slot = (il - 1) // rps
            r = (il - 1) - slot * rps
            t = (jl - 1) + slot
            su = slot // 128
            la = slot - su * 128
            grow = ((t >> 4) - b_lo) * rps + r
            word = read(win_scr, grow, su, la)
            d_read = (word >> (2 * (t & 15))) & 3
            if affine:
                bits = read(win2_scr, grow, su, la)
                bits = (bits >> (2 * (t & 15))) & 3
                d = jnp.where(
                    st == 1, _LEFT, jnp.where(st == 2, _TOP, d_read)
                )
            else:
                d = d_read
            if local:
                in_h = (st == 0) if affine else jnp.asarray(True)
                stop = jnp.logical_and(in_h, d == _STOP)
            else:
                stop = jnp.asarray(False)
            emit = jnp.logical_not(stop)
            mvw = jnp.where(
                k % 16 == 0, d, mvw | (d << (2 * (k % 16)))
            )

            @pl.when(jnp.logical_and(emit, k % 16 == 15))
            def _flush():
                stash_word(k // 16, mvw)

            take_t = jnp.logical_and(
                emit, jnp.logical_or(d == _DIAG, d == _LEFT)
            )
            take_p = jnp.logical_and(
                emit, jnp.logical_or(d == _DIAG, d == _TOP)
            )
            if affine:
                eb = (bits & 1) == 1
                fb = (bits & 2) == 2
                st_new = jnp.where(
                    jnp.logical_and(d == _LEFT, eb),
                    1,
                    jnp.where(jnp.logical_and(d == _TOP, fb), 2, 0),
                )
                st = jnp.where(emit, st_new, st)
            k = k + emit.astype(_INT)
            i = i - take_p.astype(_INT)
            j = j - take_t.astype(_INT)
            done = jnp.logical_or(done, stop)
            if local:
                done = jnp.logical_or(
                    done, jnp.logical_or(i == 0, j == 0)
                )
            return (i, j, st, k, mvw, done)

        return jax.lax.while_loop(
            inner_cond, inner_body, (i, j, st, k, mvw, done)
        )

    i, j, st, k, mvw, done = jax.lax.while_loop(
        outer_cond, outer_body,
        (i_start, j_start, st_start, jnp.asarray(0, _INT),
         jnp.asarray(0, _INT), jnp.asarray(False)),
    )

    # Flush the trailing partial move word, then the trailing acc row
    # (idempotent when the last row was already stored in-loop).
    @pl.when(k % 16 != 0)
    def _tail():
        acc_scr[0:1, :] = jnp.where(
            lane_row == (k // 16) % 128, mvw, acc_scr[0:1, :]
        )

    @pl.when(k > 0)
    def _tail_row():
        kw_last = (k + 15) // 16 - 1
        mv_ref[pl.ds(kw_last // 128, 1), :] = acc_scr[0:1, :]

    res_ref[0, 0] = k
    res_ref[0, 1] = i
    res_ref[0, 2] = j
    res_ref[0, 3] = st
    res_ref[0, 4] = done.astype(_INT)


@functools.partial(
    jax.jit,
    static_argnames=("rps", "local", "affine", "max_moves", "interpret"),
)
def pallas_walk_skewed_window(words, words2, rps: int, row_lo, col_lo,
                              i0, j0, state0, local: bool,
                              affine: bool, max_moves: int,
                              interpret: bool = False):
    """Walk a re-filled tile's skewed words entirely inside one Pallas
    kernel.  ``words`` (and ``words2`` for affine run-continuation bits)
    stay in HBM; the kernel DMAs rolling windows into VMEM.

    Returns (packed_moves, count, i, j, state, done): packed_moves is
    (128*ceil(max_moves/2048),) int32 with move p at bits 2(p%16) of
    word p//16 (unpack with unpack_moves).  Moves land in VMEM rows, so
    max_moves is bounded by a VMEM budget (a few MB), not the SMEM cap
    that limited round 2's one-dispatch engine to ~131k moves.
    """
    w_rows, srows, _ = words.shape
    assert rps & (rps - 1) == 0, "rps must be a power of two"
    num_groups = w_rows // rps
    groups = min(WINDOW_GROUPS, num_groups)
    mv_words = -(-max_moves // 16)
    mv_rows = -(-mv_words // 128)
    kernel = functools.partial(
        _walker_kernel, rps, srows, groups, local, affine
    )
    scal = jnp.stack([
        jnp.asarray(row_lo, _INT), jnp.asarray(col_lo, _INT),
        jnp.asarray(i0, _INT), jnp.asarray(j0, _INT),
        jnp.asarray(state0, _INT),
    ]).reshape(1, 5)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [scal, words]
    if affine:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        inputs.append(words2)
    scratch = [pltpu.VMEM((groups * rps, srows, 128), _INT)]
    if affine:
        scratch.append(pltpu.VMEM((groups * rps, srows, 128), _INT))
    scratch.append(pltpu.VMEM((1, 128), _INT))  # move-word lane acc
    scratch.append(pltpu.SemaphoreType.DMA(()))
    if affine:
        scratch.append(pltpu.SemaphoreType.DMA(()))
    mv, res = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mv_rows, 128), _INT),
            jax.ShapeDtypeStruct((1, 5), _INT),
        ),
        scratch_shapes=scratch,
        # Two affine windows at rps=16 reach the default 16 MiB
        # scoped-VMEM cap; lift it.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(*inputs)
    return (
        mv.reshape(-1), res[0, 0], res[0, 1], res[0, 2], res[0, 3],
        res[0, 4].astype(bool),
    )


def unpack_moves(packed, count: int):
    """(ceil(max/16),) packed int32 -> (count,) uint8 move list (numpy)."""
    import numpy as np

    packed = np.asarray(packed)
    idx = np.arange(count)
    return (
        (packed[idx // 16] >> (2 * (idx % 16))) & 3
    ).astype(np.uint8)
