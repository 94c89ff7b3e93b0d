"""Batched on-device traceback over per-pair packed direction words.

Completes the end-to-end batch path: batch_fill_dirs_pallas leaves every
pair's 2-bit direction words in HBM; here a single lockstep
lax.while_loop walks ALL pairs at once — each step is one batched gather
(one word per live pair), and the step's moves are packed 16-per-int32
and written as dense rows (a pair emits on a PREFIX of steps, so its
k-th move lands at step k — no scatters anywhere).  Only the packed move
lists leave the device; the host replays them through the same native
move emitter the checkpointed engine uses, so walk semantics are
byte-identical to the reference's traceBackNW / traceBackSW
(alignSequenceCPU.cpp:10-114): NW forces TOP in column 0 and LEFT in
row 0; SW starts at the best cell and stops on STOP or the first
row/column.  The reference can only run full alignments one at a time
even in its batch benchmark (tests/benchmarks.cu:271-332).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fill import DIR_ROWS_PER_WORD

_INT = jnp.int32
_LEFT, _DIAG, _TOP, _STOP = 0, 1, 2, 3

# VMEM budget of one pair's rolling direction window in the per-pair
# Pallas walker, and its word-group depth.
WALKER_WINDOW_GROUPS = 8
WALKER_WINDOW_BYTES = 8 * 1024 * 1024
# SMEM cap of one pair's packed-move output row (matches the validated
# direct-engine SMEM budget, ops/direct.py).
WALKER_MAX_MOVES = 131264


@functools.partial(
    jax.jit, static_argnames=("local", "semi", "max_len")
)
def batch_device_traceback(dirs, ns, ms, bis, bjs,
                           local: bool, semi: bool, max_len: int,
                           dirs2=None):
    """Walk every pair's direction words in lockstep on device.

    Args:
      dirs: (num_tiles, W, N, sub_rows, 128) int32 from
        batch_fill_dirs_pallas (word (t, w, j, su, la) = rows
        16w+1..16w+16 at column j+1 of pair t*tile_pairs + su*128 + la).
      ns, ms: (B,) real lengths; bis/bjs: (B,) SW/semi start cells.
      max_len: static move-count bound (>= N + M), multiple of 16.
      dirs2: affine run-continuation bitplane (same layout) — switches
        to the three-state Gotoh walk (oracle.cpp sa_align_affine): in
        state H a LEFT/TOP move opens an E/F run; inside a run the move
        is forced and the cell's bit decides extend-vs-close.

    Returns (packed, lengths, i, j): packed is (max_len/16, B) int32 —
    pair p's move k sits at bits 2(k%16) of word (k//16, p); i/j are the
    final cursors (the semi-global start offset is j).
    """
    affine = dirs2 is not None
    num_tiles, w_rows, n_cols, sub_rows, _ = dirs.shape
    b = ns.shape[0]
    tile_pairs = sub_rows * 128
    dirs_flat = dirs.reshape(-1)
    dirs2_flat = dirs2.reshape(-1) if affine else None
    pair = jnp.arange(b, dtype=_INT)
    tile = pair // tile_pairs
    slot = pair % tile_pairs
    # Flat word index of (w, j) for each pair; su*128+la == slot.  The
    # fill wrapper caps per-tile words below 2^30 elements so this
    # arithmetic stays in int32.
    pair_base = (tile * w_rows * n_cols) * tile_pairs + slot
    ns = jnp.asarray(ns, _INT)
    ms = jnp.asarray(ms, _INT)

    def word_idx(i, j):
        w = (i - 1) // DIR_ROWS_PER_WORD
        return pair_base + (w * n_cols + (j - 1)) * tile_pairs

    def read_from(flat, i, j):
        words = jnp.take(flat, word_idx(i, j))
        return (words >> (2 * ((i - 1) % DIR_ROWS_PER_WORD))) & 3

    def read_dirs(i, j):
        return read_from(dirs_flat, i, j)

    if local or semi:
        i0, j0 = jnp.asarray(bis, _INT), jnp.asarray(bjs, _INT)
    else:
        i0, j0 = ms, ns
    if local:
        alive0 = jnp.logical_and(i0 > 0, j0 > 0)
    elif semi:
        alive0 = i0 > 0
    else:
        alive0 = jnp.logical_or(i0 > 0, j0 > 0)

    out0 = jnp.zeros((max_len // 16, b), jnp.int32)

    def cond(state):
        return jnp.any(state[4])

    def body(state):
        i, j, k, step, alive, word, st, out = state
        ic = jnp.maximum(i, 1)
        jc = jnp.maximum(j, 1)
        d_read = read_dirs(ic, jc)
        if affine:
            # Inside a gap run the move is forced; a run can never
            # persist into row/column 0 (its continuation bit closes at
            # the boundary), so the edge overrides below see state H.
            d_read = jnp.where(
                st == 1, _LEFT, jnp.where(st == 2, _TOP, d_read)
            )
        if local:
            d = d_read
            if affine:
                stop_now = jnp.logical_and(st == 0, d == _STOP)
            else:
                stop_now = d == _STOP
        else:
            # NW/semi first-row/column overrides
            # (alignSequenceCPU.cpp:77-81).
            d = jnp.where(
                j == 0, _TOP, jnp.where(i == 0, _LEFT, d_read)
            )
            stop_now = jnp.zeros((b,), bool)

        emit = jnp.logical_and(alive, jnp.logical_not(stop_now))
        if affine:
            bits = read_from(dirs2_flat, ic, jc)
            eb = (bits & 1) == 1
            fb = (bits & 2) == 2
            new_st = jnp.where(
                jnp.logical_and(d == _LEFT, eb),
                1,
                jnp.where(jnp.logical_and(d == _TOP, fb), 2, 0),
            )
            st = jnp.where(emit, new_st, st)
        dm = jnp.where(emit, d, 0)
        word = jnp.where(step % 16 == 0, dm, word | (dm << (2 * (step % 16))))
        flush = step % 16 == 15
        out = jax.lax.cond(
            flush,
            lambda o: jax.lax.dynamic_update_slice(
                o, word.reshape(1, b), (step // 16, 0)
            ),
            lambda o: o,
            out,
        )
        k = k + emit.astype(_INT)

        take_t = emit & jnp.logical_or(d == _DIAG, d == _LEFT)
        take_p = emit & jnp.logical_or(d == _DIAG, d == _TOP)
        i2 = jnp.where(take_p, i - 1, i)
        j2 = jnp.where(take_t, j - 1, j)

        if local:
            alive = emit & jnp.logical_not(
                jnp.logical_or(i2 == 0, j2 == 0)
            )
        elif semi:
            alive = emit & (i2 > 0)
        else:
            alive = emit & jnp.logical_or(i2 > 0, j2 > 0)
        step = jnp.minimum(step + 1, max_len - 1)
        return (i2, j2, k, step, alive, word, st, out)

    state = jax.lax.while_loop(
        cond, body,
        (i0, j0, jnp.zeros((b,), _INT), jnp.asarray(0, _INT), alive0,
         jnp.zeros((b,), _INT), jnp.zeros((b,), _INT), out0),
    )
    i, j, k, step, _, word, _, out = state
    # Flush the trailing partial word row.
    out = jax.lax.dynamic_update_slice(
        out, word.reshape(1, b), (step // 16, 0)
    )
    return out, k, i, j


def _batch_walker_kernel(groups: int, w_rows: int,
                         local: bool, semi: bool, affine: bool,
                         scal_ref, *refs):
    """Walk ONE pair per grid step: DMA a rolling word-row window of the
    pair's pair-major direction words into VMEM and chase the path with
    in-VMEM scalar reads (the single-pair walker's protocol,
    ops/pallas_walk.py, at ~0.2 us/move) — beats the lockstep XLA gather
    walk (~26 us/lockstep step) whenever the batch is small.

    The move/stop/tie state machine here (d_read override by gap state,
    first-row/column NW overrides, affine run-continuation bits) is one
    of the walkers bound by the direction-word invariant (CLAUDE.md):
    bit-identical to batch_device_traceback above, ops/pallas_walk.py
    and the native walkers — change them together, parity-pinned by
    tests/test_batch_align.py::test_batch_pallas_walker_matches_lockstep.
    The window indexing differs by design (pair-major words here,
    skewed single-pair words there), so the kernels stay separate."""
    refs = list(refs)
    dirs_hbm = refs.pop(0)
    dirs2_hbm = refs.pop(0) if affine else None
    mv_ref = refs.pop(0)
    res_ref = refs.pop(0)
    win = refs.pop(0)
    win2 = refs.pop(0) if affine else None
    sem = refs.pop(0)
    sem2 = refs.pop(0) if affine else None

    pair = pl.program_id(0)
    i0 = scal_ref[0, 0, 0]
    j0 = scal_ref[0, 0, 1]
    alive0 = scal_ref[0, 0, 2] != 0
    lane = jax.lax.broadcasted_iota(_INT, (1, 1, 128), 2)

    def read(w, grow, su, la):
        # No dynamic-lane scalar load in Mosaic: load the (1, 1, 128)
        # row and extract the lane with a masked reduce.
        row = w[pl.ds(grow, 1), pl.ds(su, 1), :]
        return jnp.sum(jnp.where(lane == la, row, 0))

    def group_of(i):
        return (jnp.maximum(i, 1) - 1) // DIR_ROWS_PER_WORD

    def outer_cond(state):
        return state[5]

    def outer_body(state):
        i, j, st, k, mvw, alive = state
        w_hi = group_of(i)
        w_lo = jnp.minimum(
            jnp.maximum(w_hi - (groups - 1), 0),
            jnp.maximum(w_rows - groups, 0),
        )
        copy = pltpu.make_async_copy(
            dirs_hbm.at[pair, pl.ds(w_lo, groups)], win, sem
        )
        copy.start()
        if affine:
            copy2 = pltpu.make_async_copy(
                dirs2_hbm.at[pair, pl.ds(w_lo, groups)], win2, sem2
            )
            copy2.start()
            copy2.wait()
        copy.wait()

        def inner_cond(state):
            i, j, st, k, mvw, alive = state
            return jnp.logical_and(alive, group_of(i) >= w_lo)

        def inner_body(state):
            i, j, st, k, mvw, alive = state
            ic = jnp.maximum(i, 1)
            jc = jnp.maximum(j, 1)
            grow = group_of(i) - w_lo
            jw = jc - 1
            su = jw // 128
            la = jw - su * 128
            shift = 2 * ((ic - 1) % DIR_ROWS_PER_WORD)
            d_read = (read(win, grow, su, la) >> shift) & 3
            if affine:
                bits = (read(win2, grow, su, la) >> shift) & 3
                d_read = jnp.where(
                    st == 1, _LEFT, jnp.where(st == 2, _TOP, d_read)
                )
            if local:
                d = d_read
                in_h = (st == 0) if affine else jnp.asarray(True)
                stop = jnp.logical_and(in_h, d == _STOP)
            else:
                # NW/semi first-row/column overrides
                # (alignSequenceCPU.cpp:77-81).
                d = jnp.where(
                    j == 0, _TOP, jnp.where(i == 0, _LEFT, d_read)
                )
                stop = jnp.asarray(False)
            emit = jnp.logical_not(stop)
            dm = jnp.where(emit, d, 0)
            mvw = jnp.where(k % 16 == 0, dm, mvw | (dm << (2 * (k % 16))))

            @pl.when(jnp.logical_and(emit, k % 16 == 15))
            def _flush():
                mv_ref[0, 0, k // 16] = mvw

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
            if local:
                alive = jnp.logical_and(
                    emit,
                    jnp.logical_and(i > 0, j > 0),
                )
            elif semi:
                alive = jnp.logical_and(emit, i > 0)
            else:
                alive = jnp.logical_and(
                    emit, jnp.logical_or(i > 0, j > 0)
                )
            # Hard cap at the move buffer's capacity.  A legitimate walk
            # has at most i0+j0 <= max_len moves, so the cap never fires
            # on correct data — but a misread STOP word in a non-local
            # walk neither stops nor moves the cursors, and an unbounded
            # loop would then write mv_ref past its SMEM block (a TPU
            # worker kill, not a Python error).  Bound it: a poisoned
            # pair truncates (caught by parity checks) instead of
            # killing the chip.
            alive = jnp.logical_and(alive, k < mv_ref.shape[-1] * 16)
            return (i, j, st, k, mvw, alive)

        return jax.lax.while_loop(
            inner_cond, inner_body, (i, j, st, k, mvw, alive)
        )

    i, j, st, k, mvw, alive = jax.lax.while_loop(
        outer_cond, outer_body,
        (i0, j0, jnp.asarray(0, _INT), jnp.asarray(0, _INT),
         jnp.asarray(0, _INT), alive0),
    )

    @pl.when(k % 16 != 0)
    def _tail():
        mv_ref[0, 0, k // 16] = mvw

    res_ref[0, 0, 0] = k
    res_ref[0, 0, 1] = i
    res_ref[0, 0, 2] = j


def fits_batch_walker(n_cols: int, w_rows: int, max_len: int,
                      affine: bool) -> bool:
    """Whether the per-pair walker can take this slice at all (VMEM
    window + SMEM move-row budgets); the SIZE routing is the caller's
    (config.batch_walker_max_pairs)."""
    n_blks = -(-n_cols // 128)
    groups = min(WALKER_WINDOW_GROUPS, w_rows)
    window = groups * n_blks * 128 * 4 * (2 if affine else 1)
    return window <= WALKER_WINDOW_BYTES and max_len <= WALKER_MAX_MOVES


@functools.partial(
    jax.jit, static_argnames=("local", "semi", "max_len", "interpret")
)
def batch_pallas_traceback(dirs, ns, ms, bis, bjs,
                           local: bool, semi: bool, max_len: int,
                           dirs2=None, interpret: bool = False):
    """Per-pair in-kernel walk of a batch's direction words.

    Same contract as :func:`batch_device_traceback` (same packed layout,
    same walk semantics incl. the NW edge overrides and the affine
    three-state walk), but each pair is chased by the scalar in-VMEM
    walker instead of one lockstep gather per step — the fast route for
    SMALL batches of big pairs, where the lockstep walk's ~26 us/step
    floor dominates end-to-end time.

    Returns (packed, lengths, i, j) with packed (max_len/16, B) int32.
    """
    affine = dirs2 is not None
    num_tiles, w_rows, n_cols, sub_rows, _ = dirs.shape
    b = ns.shape[0]
    assert b == num_tiles * sub_rows * 128

    # Pair-major: (tiles, W, N, su, 128) -> (B, W, N/128, 128).  One HBM
    # transpose; the walker then DMAs contiguous word-row windows.
    def to_pair_major(d):
        pm = jnp.transpose(d, (0, 3, 4, 1, 2)).reshape(b, w_rows, n_cols)
        pad = (-n_cols) % 128
        if pad:
            pm = jnp.pad(pm, ((0, 0), (0, 0), (0, pad)))
        return pm.reshape(b, w_rows, (n_cols + pad) // 128, 128)

    dirs_pm = to_pair_major(dirs)
    dirs2_pm = to_pair_major(dirs2) if affine else None
    n_blks = dirs_pm.shape[2]
    groups = min(WALKER_WINDOW_GROUPS, w_rows)

    ns = jnp.asarray(ns, _INT)
    ms = jnp.asarray(ms, _INT)
    if local or semi:
        i0, j0 = jnp.asarray(bis, _INT), jnp.asarray(bjs, _INT)
    else:
        i0, j0 = ms, ns
    if local:
        alive0 = jnp.logical_and(i0 > 0, j0 > 0)
    elif semi:
        alive0 = i0 > 0
    else:
        alive0 = jnp.logical_or(i0 > 0, j0 > 0)
    # Singleton middle axis: Mosaic requires the last two block dims to
    # be (8, 128)-divisible or equal to the array dims — a (1, 3) block
    # of a (B, 3) array violates the sublane rule, a (1, 1, 3) block of
    # (B, 1, 3) doesn't (caught on the real backend; interpret mode
    # doesn't enforce it).
    scal = jnp.stack([i0, j0, alive0.astype(_INT)], axis=1)[:, None, :]

    mv_words = max_len // 16
    kernel = functools.partial(
        _batch_walker_kernel, groups, w_rows, local, semi, affine
    )
    in_specs = [
        pl.BlockSpec(
            (1, 1, 3), lambda p: (p, 0, 0), memory_space=pltpu.SMEM
        ),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [scal, dirs_pm]
    if affine:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        inputs.append(dirs2_pm)
    scratch = [pltpu.VMEM((groups, n_blks, 128), _INT)]
    if affine:
        scratch.append(pltpu.VMEM((groups, n_blks, 128), _INT))
    scratch.append(pltpu.SemaphoreType.DMA(()))
    if affine:
        scratch.append(pltpu.SemaphoreType.DMA(()))
    mv, res = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (1, 1, mv_words), lambda p: (p, 0, 0),
                memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 1, 4), lambda p: (p, 0, 0), memory_space=pltpu.SMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, mv_words), _INT),
            jax.ShapeDtypeStruct((b, 1, 4), _INT),
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(*inputs)
    mv = mv.reshape(b, mv_words)
    res = res.reshape(b, 4)
    return mv.T, res[:, 0], res[:, 1], res[:, 2]


def unpack_batch_moves(packed: np.ndarray, count: int, p: int) -> np.ndarray:
    """Moves of pair ``p`` from the packed (max_len/16, B) array."""
    idx = np.arange(count)
    return (
        (packed[idx // 16, p] >> (2 * (idx % 16))) & 3
    ).astype(np.uint8)
