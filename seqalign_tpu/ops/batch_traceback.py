"""Batched on-device traceback over per-pair packed direction words.

Completes the end-to-end batch path: batch_fill_dirs_pallas leaves every
pair's 2-bit direction words in HBM; here a single lockstep
lax.while_loop walks ALL pairs at once — each step is one batched gather
(one word per live pair) and one batched scatter into the aligned-index
buffers, so the per-step cost amortizes over the whole batch.  Only the
aligned strings leave the device.  The reference can only run full
alignments one at a time even in its batch benchmark
(tests/benchmarks.cu:271-332; fill alignSequenceGPU.cu:463-653 + host
traceback per request).

Walk semantics are byte-identical to the reference's traceBackNW /
traceBackSW (alignSequenceCPU.cpp:10-114): NW forces TOP in column 0 and
LEFT in row 0; SW starts at the best cell, stops on STOP or on reaching
the first row/column (with the reference's cursor quirks, reproduced by
emitting via the same move-replay as the single-pair engines).
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
def batch_device_traceback(dirs, texts, patterns, ns, ms, bis, bjs,
                           gap_index, local: bool, semi: bool,
                           max_len: int):
    """Walk every pair's direction words in lockstep on device.

    Args:
      dirs: (num_tiles, W, N, sub_rows, 128) int32 from
        batch_fill_dirs_pallas (word (t, w, j, su, la) = rows
        16w+1..16w+16 at column j+1 of pair t*tile_pairs + su*128 + la).
      texts: (B, N) int32; patterns: (B, M) int32.
      ns, ms: (B,) real lengths; bis/bjs: (B,) SW/semi start cells.
      gap_index: alphabet index of '-' (== alphabet size).
      max_len: static output width (>= N + M).

    Returns (out_t, out_p, lengths, ti, pi): aligned index rows in
    reversed emission order (host slices [:length] per pair and flips),
    plus the final text/pattern cursors (the reference's start offsets).
    """
    num_tiles, w_rows, n_cols, sub_rows, _ = dirs.shape
    b = texts.shape[0]
    tile_pairs = sub_rows * 128
    dirs_flat = dirs.reshape(-1)
    pair = jnp.arange(b, dtype=_INT)
    tile = pair // tile_pairs
    slot = pair % tile_pairs
    # Flat word index of (w, j) for each pair; su*128+la == slot.
    pair_base = (tile * w_rows * n_cols) * tile_pairs + slot
    ns = jnp.asarray(ns, _INT)
    ms = jnp.asarray(ms, _INT)
    gap_index = jnp.asarray(gap_index, _INT)

    def read_dirs(i, j):
        w = (i - 1) // DIR_ROWS_PER_WORD
        idx = pair_base + (w * n_cols + (j - 1)) * tile_pairs
        words = jnp.take(dirs_flat, idx)
        return (words >> (2 * ((i - 1) % DIR_ROWS_PER_WORD))) & 3

    if local or semi:
        i0, j0 = jnp.asarray(bis, _INT), jnp.asarray(bjs, _INT)
    else:
        i0, j0 = ms, ns
    ti0 = j0 - 1
    pi0 = i0 - 1
    if local:
        alive0 = jnp.logical_and(i0 > 0, j0 > 0)
    elif semi:
        alive0 = i0 > 0
    else:
        alive0 = jnp.logical_or(i0 > 0, j0 > 0)

    out_t0 = jnp.zeros((b, max_len), jnp.int32)
    out_p0 = jnp.zeros((b, max_len), jnp.int32)

    def cond(state):
        return jnp.any(state[6])

    def body(state):
        i, j, ti, pi, k, step, alive, out_t, out_p = state
        d_read = read_dirs(jnp.maximum(i, 1), jnp.maximum(j, 1))
        if local:
            d = d_read
            stop_now = d == _STOP
        else:
            # NW/semi first-row/column overrides
            # (alignSequenceCPU.cpp:77-81); semi never reaches i == 0
            # alive (it stops there).
            d = jnp.where(
                j == 0, _TOP, jnp.where(i == 0, _LEFT, d_read)
            )
            stop_now = jnp.zeros((b,), bool)

        take_t = jnp.logical_or(d == _DIAG, d == _LEFT)
        take_p = jnp.logical_or(d == _DIAG, d == _TOP)
        emit = jnp.logical_and(alive, jnp.logical_not(stop_now))
        ch_t = jnp.where(
            take_t,
            jnp.take_along_axis(
                texts, jnp.maximum(ti, 0).reshape(b, 1), axis=1
            ).reshape(b),
            gap_index,
        )
        ch_p = jnp.where(
            take_p,
            jnp.take_along_axis(
                patterns, jnp.maximum(pi, 0).reshape(b, 1), axis=1
            ).reshape(b),
            gap_index,
        )
        # A pair emits on a PREFIX of lockstep steps (alive never comes
        # back), so every live pair's k equals the step counter — the
        # write is one dense column update, not a scatter.
        out_t = jax.lax.dynamic_update_slice(
            out_t, jnp.where(emit, ch_t, 0).reshape(b, 1).astype(_INT),
            (0, step),
        )
        out_p = jax.lax.dynamic_update_slice(
            out_p, jnp.where(emit, ch_p, 0).reshape(b, 1).astype(_INT),
            (0, step),
        )
        k = k + emit.astype(_INT)
        step = jnp.minimum(step + 1, max_len - 1)

        i2 = jnp.where(emit & take_p, i - 1, i)
        j2 = jnp.where(emit & take_t, j - 1, j)

        if local:
            hit_edge = jnp.logical_or(i2 == 0, j2 == 0)
            upd = emit & jnp.logical_not(hit_edge)
            alive = upd
        elif semi:
            upd = emit
            alive = jnp.logical_and(emit, i2 > 0)
        else:
            upd = emit
            alive = jnp.logical_and(
                emit, jnp.logical_or(i2 > 0, j2 > 0)
            )
        ti = jnp.where(upd & take_t, jnp.maximum(ti - 1, 0), ti)
        pi = jnp.where(upd & take_p, jnp.maximum(pi - 1, 0), pi)
        return (i2, j2, ti, pi, k, step, alive, out_t, out_p)

    state = jax.lax.while_loop(
        cond, body,
        (i0, j0, ti0, pi0, jnp.zeros((b,), _INT),
         jnp.asarray(0, _INT), alive0, out_t0, out_p0),
    )
    i, j, ti, pi, k, _, _, out_t, out_p = state
    return out_t, out_p, k, ti, pi, j
