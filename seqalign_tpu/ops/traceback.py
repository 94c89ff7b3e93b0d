"""On-device traceback from packed direction words.

The reference copies the whole byte direction matrix to pinned host
memory and walks it on the CPU (alignSequenceGPU.cu:588-648).  Our
default does the equivalent with 4x less transfer (2-bit words, native
host walk); this module goes further and reconstructs the alignment
entirely on device with a lax.while_loop over the packed words, so only
the O(n+m) aligned strings ever leave the device.

Semantics are byte-identical to the reference walks, including the NW
first-row/column overrides (alignSequenceCPU.cpp:77-81) and the SW
early-exit on reaching the first row/column (alignSequenceCPU.cpp:44-46).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_fill import DIR_ROWS_PER_WORD

DIR_STEPS_PER_WORD = 16  # skewed format: 16 sweep steps per int32 word

_INT = jnp.int32
_LEFT, _DIAG, _TOP, _STOP = 0, 1, 2, 3


def _read_dir(words, i, j):
    word = words[(i - 1) // DIR_ROWS_PER_WORD, j - 1]
    return (word >> (2 * ((i - 1) % DIR_ROWS_PER_WORD))) & 3


@functools.partial(jax.jit, static_argnames=("local",))
def device_traceback(words, text, pattern, n, m, best_i, best_j,
                     gap_index, local: bool = False):
    """Walk the packed direction matrix on device.

    Args:
      words: (W, P) int32 packed directions (device array).
      text, pattern: int32 alphabet-index arrays (device).
      n, m: real lengths.  best_i/best_j: SW start cell (ignored for NW).
      gap_index: alphabet index of the gap character (== alphabet size).
      local: SW semantics when True.

    Returns (out_text, out_pattern, length, start_text, start_pattern):
      reversed emission order — host slices [:length] and flips.
    """
    max_len = text.shape[0] + pattern.shape[0]
    out_t = jnp.zeros((max_len,), jnp.int32)
    out_p = jnp.zeros((max_len,), jnp.int32)
    n = jnp.asarray(n, _INT)
    m = jnp.asarray(m, _INT)
    gap_index = jnp.asarray(gap_index, _INT)

    if local:
        i0, j0 = jnp.asarray(best_i, _INT), jnp.asarray(best_j, _INT)
    else:
        i0, j0 = m, n
    ti0 = j0 - 1
    pi0 = i0 - 1

    def cond(state):
        i, j, ti, pi, k, alive, out_t, out_p = state
        return alive

    def body(state):
        i, j, ti, pi, k, alive, out_t, out_p = state
        if local:
            d = _read_dir(words, i, j)
            stop_now = d == _STOP
        else:
            d = jnp.where(
                j == 0,
                _TOP,
                jnp.where(i == 0, _LEFT, _read_dir(words, i, j)),
            )
            stop_now = jnp.asarray(False)

        take_t = jnp.logical_or(d == _DIAG, d == _LEFT)
        take_p = jnp.logical_or(d == _DIAG, d == _TOP)
        emit = jnp.logical_not(stop_now)
        ch_t = jnp.where(take_t, text[jnp.maximum(ti, 0)], gap_index)
        ch_p = jnp.where(take_p, pattern[jnp.maximum(pi, 0)], gap_index)
        out_t = jnp.where(emit, out_t.at[k].set(ch_t), out_t)
        out_p = jnp.where(emit, out_p.at[k].set(ch_p), out_p)
        k = k + jnp.where(emit, 1, 0)

        i2 = jnp.where(emit & take_p, i - 1, i)
        j2 = jnp.where(emit & take_t, j - 1, j)

        if local:
            hit_edge = jnp.logical_or(i2 == 0, j2 == 0)
            upd = emit & jnp.logical_not(hit_edge)
            alive = upd
        else:
            upd = emit
            alive = jnp.logical_and(emit, jnp.logical_or(i2 > 0, j2 > 0))
        ti = jnp.where(upd & take_t, jnp.maximum(ti - 1, 0), ti)
        pi = jnp.where(upd & take_p, jnp.maximum(pi - 1, 0), pi)
        return (i2, j2, ti, pi, k, alive, out_t, out_p)

    alive0 = jnp.asarray(True) if not local else jnp.logical_and(i0 > 0, j0 > 0)
    state = jax.lax.while_loop(
        cond, body,
        (i0, j0, ti0, pi0, jnp.asarray(0, _INT), alive0, out_t, out_p),
    )
    i, j, ti, pi, k, _, out_t, out_p = state
    return out_t, out_p, k, ti, pi


def run_device_traceback(words, text, pattern, n, m, best_i, best_j,
                         alphabet_size: int, local: bool):
    """Host wrapper: returns (aligned_text_idx, aligned_pattern_idx,
    start_text, start_pattern) as numpy in final (unreversed) order."""
    out_t, out_p, k, ti, pi = device_traceback(
        jnp.asarray(words), jnp.asarray(np.asarray(text, np.int32)),
        jnp.asarray(np.asarray(pattern, np.int32)),
        n, m, best_i, best_j, alphabet_size, local=local,
    )
    k = int(k)
    at = np.asarray(jax.device_get(out_t))[:k][::-1].astype(np.uint8)
    ap = np.asarray(jax.device_get(out_p))[:k][::-1].astype(np.uint8)
    return at, ap, int(ti), int(pi)


@functools.partial(jax.jit, static_argnames=("local", "max_moves"))
def device_walk_window(words, row_lo, col_lo, i0, j0, local: bool,
                       max_moves: int):
    """Walk packed tile directions on device while the cell stays inside
    the tile (rows row_lo+1.., columns col_lo+1..; ``words`` is the
    tile's packed matrix in tile-local coordinates).

    Mirrors the native sa_walk_packed_window exactly; used by the
    checkpointed long-pair engine so only the O(path) move list leaves
    the device instead of the tile's direction words.

    Returns (moves, count, i, j, done) — moves in walk (end-to-start)
    order, padded to max_moves.
    """
    out0 = jnp.zeros((max_moves,), jnp.int32)
    row_lo = jnp.asarray(row_lo, _INT)
    col_lo = jnp.asarray(col_lo, _INT)
    unroll = 8  # amortize while_loop bookkeeping over the ~us/step gathers

    def inside(i, j, done):
        return jnp.logical_and(
            jnp.logical_not(done),
            jnp.logical_and(i > row_lo, j > col_lo),
        )

    def cond(state):
        i, j, k, done, out = state
        return inside(i, j, done)

    def body(state):
        i, j, k, done, out = state
        for _ in range(unroll):
            live = inside(i, j, done)
            d = _read_dir(
                words,
                jnp.maximum(i - row_lo, 1),
                jnp.maximum(j - col_lo, 1),
            )
            stop = (d == _STOP) if local else jnp.asarray(False)
            emit = jnp.logical_and(live, jnp.logical_not(stop))
            out = jnp.where(emit, out.at[k].set(d), out)
            k = k + jnp.where(emit, 1, 0)
            take_t = jnp.logical_and(
                emit, jnp.logical_or(d == _DIAG, d == _LEFT)
            )
            take_p = jnp.logical_and(
                emit, jnp.logical_or(d == _DIAG, d == _TOP)
            )
            i = i - take_p.astype(_INT)
            j = j - take_t.astype(_INT)
            if local:
                done = jnp.logical_or(
                    done,
                    jnp.logical_and(
                        live,
                        jnp.logical_or(
                            stop, jnp.logical_or(i == 0, j == 0)
                        ),
                    ),
                )
        return (i, j, k, done, out)

    i, j, k, done, out = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(i0, _INT), jnp.asarray(j0, _INT),
         jnp.asarray(0, _INT), jnp.asarray(False), out0),
    )
    return out, k, i, j, done


def _read_dir_skewed(words, rps: int, i, j):
    """Direction of tile-local cell (i, j) (1-based) from the wavefront
    kernel's skewed word format: slot s = (i-1)//rps owns in-slot row
    r = (i-1)%rps; the cell's sweep step is t = j-1+s and word
    ((t//16)*rps + r, s//128, s%128) holds its 2 bits at bit 2*(t%16)."""
    ri = i - 1
    slot = ri // rps
    r = ri - slot * rps
    t = j - 1 + slot
    word = words[(t // DIR_STEPS_PER_WORD) * rps + r, slot // 128, slot % 128]
    return (word >> (2 * (t % DIR_STEPS_PER_WORD))) & 3


@functools.partial(
    jax.jit, static_argnames=("rps", "local", "max_moves")
)
def device_walk_skewed_window(words, rps: int, row_lo, col_lo, i0, j0,
                              local: bool, max_moves: int):
    """device_walk_window over the wavefront kernel's *skewed* word
    format (one re-filled tile, tile-local coordinates).

    ``words``: (tile_steps/16 * rps, slots/128, 128) int32 from
    wavefront_strip(with_dirs=True).  Mirrors the native
    sa_walk_skewed_window exactly.  Returns (moves, count, i, j, done).
    """
    out0 = jnp.zeros((max_moves,), jnp.int32)
    row_lo = jnp.asarray(row_lo, _INT)
    col_lo = jnp.asarray(col_lo, _INT)
    unroll = 8

    def inside(i, j, done):
        return jnp.logical_and(
            jnp.logical_not(done),
            jnp.logical_and(i > row_lo, j > col_lo),
        )

    def cond(state):
        i, j, k, done, out = state
        return inside(i, j, done)

    def body(state):
        i, j, k, done, out = state
        for _ in range(unroll):
            live = inside(i, j, done)
            d = _read_dir_skewed(
                words, rps,
                jnp.maximum(i - row_lo, 1),
                jnp.maximum(j - col_lo, 1),
            )
            stop = (d == _STOP) if local else jnp.asarray(False)
            emit = jnp.logical_and(live, jnp.logical_not(stop))
            out = jnp.where(emit, out.at[k].set(d), out)
            k = k + jnp.where(emit, 1, 0)
            take_t = jnp.logical_and(
                emit, jnp.logical_or(d == _DIAG, d == _LEFT)
            )
            take_p = jnp.logical_and(
                emit, jnp.logical_or(d == _DIAG, d == _TOP)
            )
            i = i - take_p.astype(_INT)
            j = j - take_t.astype(_INT)
            if local:
                done = jnp.logical_or(
                    done,
                    jnp.logical_and(
                        live,
                        jnp.logical_or(
                            stop, jnp.logical_or(i == 0, j == 0)
                        ),
                    ),
                )
        return (i, j, k, done, out)

    i, j, k, done, out = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(i0, _INT), jnp.asarray(j0, _INT),
         jnp.asarray(0, _INT), jnp.asarray(False), out0),
    )
    return out, k, i, j, done


@functools.partial(
    jax.jit, static_argnames=("rps", "local", "max_moves")
)
def device_walk_affine_skewed_window(words, words2, rps: int, row_lo,
                                     col_lo, i0, j0, state0, local: bool,
                                     max_moves: int):
    """Affine (Gotoh) window walk over skewed direction words.

    ``words`` holds the 2-bit H-state directions (same encoding as the
    linear kernel), ``words2`` the run-continuation bits per cell
    (bit 0: E-run continues, bit 1: F-run continues) — together they
    replay oracle.cpp sa_align_affine's three-state walk exactly: in
    state H a LEFT/TOP move enters the E/F run; inside a run the move is
    forced and the cell's continuation bit decides whether the run
    extends (ties close the run, per the oracle's documented policy).

    ``state0``: 0 = H, 1 = E-run, 2 = F-run — carried across tiles.
    Returns (moves, count, i, j, state, done).
    """
    out0 = jnp.zeros((max_moves,), jnp.int32)
    row_lo = jnp.asarray(row_lo, _INT)
    col_lo = jnp.asarray(col_lo, _INT)
    unroll = 8

    def inside(i, j, done):
        return jnp.logical_and(
            jnp.logical_not(done),
            jnp.logical_and(i > row_lo, j > col_lo),
        )

    def cond(state):
        i, j, st, k, done, out = state
        return inside(i, j, done)

    def body(carry):
        i, j, st, k, done, out = carry
        for _ in range(unroll):
            live = inside(i, j, done)
            il = jnp.maximum(i - row_lo, 1)
            jl = jnp.maximum(j - col_lo, 1)
            d_read = _read_dir_skewed(words, rps, il, jl)
            bits = _read_dir_skewed(words2, rps, il, jl)
            d = jnp.where(
                st == 1, _LEFT, jnp.where(st == 2, _TOP, d_read)
            )
            stop = (
                jnp.logical_and(st == 0, d == _STOP)
                if local
                else jnp.asarray(False)
            )
            emit = jnp.logical_and(live, jnp.logical_not(stop))
            out = jnp.where(emit, out.at[k].set(d), out)
            k = k + jnp.where(emit, 1, 0)
            take_t = jnp.logical_and(
                emit, jnp.logical_or(d == _DIAG, d == _LEFT)
            )
            take_p = jnp.logical_and(
                emit, jnp.logical_or(d == _DIAG, d == _TOP)
            )
            eb = (bits & 1) == 1
            fb = (bits & 2) == 2
            new_st = jnp.where(
                jnp.logical_and(d == _LEFT, eb),
                1,
                jnp.where(jnp.logical_and(d == _TOP, fb), 2, 0),
            )
            st = jnp.where(emit, new_st, st)
            i = i - take_p.astype(_INT)
            j = j - take_t.astype(_INT)
            if local:
                done = jnp.logical_or(
                    done,
                    jnp.logical_and(
                        live,
                        jnp.logical_or(
                            stop, jnp.logical_or(i == 0, j == 0)
                        ),
                    ),
                )
        return (i, j, st, k, done, out)

    i, j, st, k, done, out = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(i0, _INT), jnp.asarray(j0, _INT),
         jnp.asarray(state0, _INT), jnp.asarray(0, _INT),
         jnp.asarray(False), out0),
    )
    return out, k, i, j, st, done


def emit_moves_affine(moves: np.ndarray, start_i: int, start_j: int,
                      text: np.ndarray, pattern: np.ndarray,
                      gap_index: int):
    """Replay an affine move list (walk order) into aligned index arrays.

    The affine oracle emits straight from the walk cursor with no clamp
    quirks (oracle.cpp sa_align_affine): at each move, the text char is
    text[j-1] unless the move is TOP, the pattern char pattern[i-1]
    unless LEFT; start offsets are the final (j, i) floored at 0.
    Returns (aligned_text_idx, aligned_pattern_idx, start_text,
    start_pattern).
    """
    moves = np.asarray(moves, dtype=np.int64)
    text = np.asarray(text)
    pattern = np.asarray(pattern)
    if moves.size == 0:
        return (
            np.zeros(0, np.uint8), np.zeros(0, np.uint8),
            max(start_j, 0), max(start_i, 0),
        )
    take_t = moves != _TOP
    take_p = moves != _LEFT
    j_pos = start_j - np.concatenate([[0], np.cumsum(take_t[:-1])])
    i_pos = start_i - np.concatenate([[0], np.cumsum(take_p[:-1])])
    at = np.where(
        take_t, text[np.maximum(j_pos - 1, 0)], gap_index
    ).astype(np.uint8)
    ap = np.where(
        take_p, pattern[np.maximum(i_pos - 1, 0)], gap_index
    ).astype(np.uint8)
    final_j = int(start_j - take_t.sum())
    final_i = int(start_i - take_p.sum())
    return at[::-1].copy(), ap[::-1].copy(), max(final_j, 0), max(final_i, 0)


def pack_words_skewed(dirs_bytes: np.ndarray, rps: int,
                      slots: int) -> np.ndarray:
    """Pack a (rows+1, cols+1) byte direction matrix (incl. borders) into
    the wavefront kernel's skewed word format — testing helper."""
    m = dirs_bytes.shape[0] - 1
    p = dirs_bytes.shape[1] - 1
    assert m <= rps * slots
    steps = p + slots - 1
    steps_pad = -(-steps // DIR_STEPS_PER_WORD) * DIR_STEPS_PER_WORD
    words = np.zeros(
        (steps_pad // DIR_STEPS_PER_WORD * rps, slots // 128, 128),
        dtype=np.int64,
    )
    for i in range(1, m + 1):
        slot, r = (i - 1) // rps, (i - 1) % rps
        for j in range(1, p + 1):
            t = j - 1 + slot
            words[
                (t // DIR_STEPS_PER_WORD) * rps + r, slot // 128, slot % 128
            ] |= int(dirs_bytes[i, j]) << (2 * (t % DIR_STEPS_PER_WORD))
    return words.astype(np.uint32).astype(np.int32)


def pack_words(dirs_bytes: np.ndarray) -> np.ndarray:
    """Pack a (rows, cols) byte direction matrix (incl. the row-0/col-0
    borders) into the kernel word format — testing helper."""
    m = dirs_bytes.shape[0] - 1
    p = dirs_bytes.shape[1] - 1
    m_pad = ((m + DIR_ROWS_PER_WORD - 1) // DIR_ROWS_PER_WORD) * DIR_ROWS_PER_WORD
    words = np.zeros((m_pad // DIR_ROWS_PER_WORD, p), dtype=np.int32)
    for i in range(1, m + 1):
        words[(i - 1) // DIR_ROWS_PER_WORD] |= (
            dirs_bytes[i, 1:].astype(np.int32)
            << (2 * ((i - 1) % DIR_ROWS_PER_WORD))
        )
    return words
