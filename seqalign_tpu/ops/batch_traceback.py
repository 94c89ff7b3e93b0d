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

from .pallas_fill import DIR_ROWS_PER_WORD

_INT = jnp.int32
_LEFT, _DIAG, _TOP, _STOP = 0, 1, 2, 3


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


def unpack_batch_moves(packed: np.ndarray, count: int, p: int) -> np.ndarray:
    """Moves of pair ``p`` from the packed (max_len/16, B) array."""
    idx = np.arange(count)
    return (
        (packed[idx // 16, p] >> (2 * (idx % 16))) & 3
    ).astype(np.uint8)
