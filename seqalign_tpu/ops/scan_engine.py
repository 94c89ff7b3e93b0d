"""Row-scan DP engines (JAX/XLA TPU path).

TPU-first re-design of the reference matrix-fill engines
(reference: alignSequenceCPU.cpp:116-284, alignSequenceGPU.cu:73-353).
Instead of the reference's anti-diagonal wavefront + inter-chunk
spin-lock protocol, we exploit the classic max-plus identity for linear
gap penalties: within one DP row,

    S[i, j] = max(T[i, j], S[i, j-1] - g)            with
    T[i, j] = max(S[i-1, j-1] + sub(i, j), S[i-1, j] - g)

unrolls to

    S[i, j] = max_{k <= j} (T[i, k] - g * (j - k))
            = cummax(T[i, :] + g * iota)[j] - g * j,

so an entire row is computed from the previous row with a handful of
vector ops and one ``lax.cummax`` — fully vectorized along the 128-lane
dimension, no wavefront, no spin locks.  The outer dependency is a plain
``lax.scan`` over pattern rows.  Substitution scores come from a query
profile (score_matrix rows gathered per text column), so the inner loop
has no per-cell gathers.

Shapes are padded (columns and rows to multiples of 128) with the real
lengths (n, m) passed dynamically: padded columns carry a PAD_SCORE
profile and padded rows are masked out of result extraction, so one
compiled program serves a whole (padded-N, padded-M) bucket.

Tie policy replicated exactly from the reference
(alignSequenceCPU.cpp:265-269): DIAG only when strictly greater than
both gap moves; LEFT beats TOP on gap-move ties.  This yields
bit-identical direction matrices and therefore byte-identical tracebacks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import DIAG, LEFT, STOP, TOP

# Sentinel for padded profile columns.  Large enough to dominate any real
# score (|score| <= 2^15 per cell, lengths <= 2^22) without int32 overflow.
PAD_SCORE = -(1 << 24)

_INT = jnp.int32


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def padded_width(n: int) -> int:
    """Padded DP-row width (columns incl. the leading gap column)."""
    return max(128, round_up(n + 1, 128))


def padded_rows(m: int) -> int:
    """Padded pattern-row count (excl. the gap row)."""
    return max(128, round_up(m, 128))


def pad_pattern(pattern: np.ndarray, m_pad: int) -> np.ndarray:
    """Pad a pattern index array to m_pad rows (padding rows use letter 0;
    they are computed but masked out of all results)."""
    out = np.zeros(m_pad, dtype=np.int32)
    out[: pattern.shape[0]] = pattern
    return out


def build_profile(text: jax.Array, score_matrix: jax.Array, width: int) -> jax.Array:
    """Query profile: profile[a, j] = score(a, text[j]).

    Shape (K, width-1) int32, padded with PAD_SCORE beyond the real text.
    One gather per alignment instead of one per DP cell.
    """
    n = text.shape[0]
    prof = score_matrix.astype(_INT)[:, text.astype(_INT)]
    pad = (width - 1) - n
    if pad:
        prof = jnp.pad(prof, ((0, 0), (0, pad)), constant_values=PAD_SCORE)
    return prof


def _direction_row(diag, top, left, local: bool):
    """Per-cell direction under the reference tie policy."""
    gap_best = jnp.maximum(left, top)
    is_diag = diag > gap_best
    is_left = jnp.logical_and(jnp.logical_not(is_diag), left >= top)
    d = jnp.where(is_diag, DIAG, jnp.where(is_left, LEFT, TOP)).astype(jnp.int8)
    if local:
        best = jnp.maximum(diag, gap_best)
        d = jnp.where(best > 0, d, jnp.int8(STOP))
    return d


@functools.partial(jax.jit, static_argnames=("with_dirs",))
def nw_fill(profile: jax.Array, pattern: jax.Array, gap: jax.Array,
            n: jax.Array, m: jax.Array, with_dirs: bool = True):
    """Global (Needleman-Wunsch) fill.

    Args:
      profile: (K, P-1) int32 query profile (PAD_SCORE beyond the text).
      pattern: (M_pad,) int array of pattern alphabet indices (padded).
      gap: scalar int32 linear gap penalty.
      n, m: real text / pattern lengths (dynamic).
      with_dirs: also emit the (M_pad+1, P) int8 direction matrix.

    Returns (dirs | None, score) where score = S[m, n].
    """
    p = profile.shape[1] + 1
    m_pad = pattern.shape[0]
    gap = jnp.asarray(gap, _INT)
    n = jnp.asarray(n, _INT)
    m = jnp.asarray(m, _INT)
    jcol = jnp.arange(p, dtype=_INT)
    gj = gap * jcol
    row0 = -gj

    def step(carry, xs):
        prev, result = carry
        pat_i, i = xs
        sub = jax.lax.dynamic_index_in_dim(profile, pat_i, keepdims=False)
        diag = prev[:-1] + sub
        top = prev[1:] - gap
        tmp = jnp.maximum(diag, top)
        tmp_ext = jnp.concatenate([(-gap * i)[None], tmp])
        row = jax.lax.cummax(tmp_ext + gj) - gj
        result = jnp.where(
            i == m,
            jax.lax.dynamic_index_in_dim(row, n, keepdims=False),
            result,
        )
        if with_dirs:
            left = row[:-1] - gap
            d = _direction_row(diag, top, left, local=False)
            dir_row = jnp.concatenate([jnp.full((1,), TOP, jnp.int8), d])
        else:
            dir_row = None
        return (row, result), dir_row

    xs = (pattern.astype(_INT), jnp.arange(1, m_pad + 1, dtype=_INT))
    # m == 0 degenerates to the init row's value at column n.
    init_result = jax.lax.dynamic_index_in_dim(row0, n, keepdims=False)
    (_, score), dir_rows = jax.lax.scan(step, (row0, init_result), xs)
    if with_dirs:
        dirs = jnp.concatenate(
            [jnp.full((1, p), LEFT, jnp.int8), dir_rows], axis=0
        )
    else:
        dirs = None
    return dirs, score


@functools.partial(jax.jit, static_argnames=("with_dirs",))
def sw_fill(profile: jax.Array, pattern: jax.Array, gap: jax.Array,
            n: jax.Array, m: jax.Array, with_dirs: bool = True):
    """Local (Smith-Waterman) fill.

    Best-cell tracking matches the reference exactly: the recorded index
    is the first row-major occurrence of the maximum (strict improvement
    only, alignSequenceCPU.cpp:191-192).  Padded columns/rows are masked
    out of the maximum.

    Returns (dirs | None, best_score, best_flat_idx) with the flat index
    in padded (row * P + col) coordinates.
    """
    p = profile.shape[1] + 1
    m_pad = pattern.shape[0]
    gap = jnp.asarray(gap, _INT)
    n = jnp.asarray(n, _INT)
    m = jnp.asarray(m, _INT)
    jcol = jnp.arange(p, dtype=_INT)
    gj = gap * jcol
    col_valid = jcol <= n
    row0 = jnp.zeros((p,), _INT)

    def step(carry, xs):
        prev, best, best_idx = carry
        pat_i, i = xs
        sub = jax.lax.dynamic_index_in_dim(profile, pat_i, keepdims=False)
        diag = prev[:-1] + sub
        top = prev[1:] - gap
        tmp = jnp.maximum(jnp.maximum(diag, top), 0)
        tmp_ext = jnp.concatenate([jnp.zeros((1,), _INT), tmp])
        row = jax.lax.cummax(tmp_ext + gj) - gj
        if with_dirs:
            left = row[:-1] - gap
            d = _direction_row(diag, top, left, local=True)
            dir_row = jnp.concatenate([jnp.full((1,), STOP, jnp.int8), d])
        else:
            dir_row = None
        masked = jnp.where(
            jnp.logical_and(col_valid, i <= m), row, PAD_SCORE
        )
        row_max = jnp.max(masked)
        row_arg = jnp.argmax(masked).astype(_INT)
        improved = row_max > best
        best = jnp.where(improved, row_max, best)
        best_idx = jnp.where(improved, i * p + row_arg, best_idx)
        return (row, best, best_idx), dir_row

    xs = (pattern.astype(_INT), jnp.arange(1, m_pad + 1, dtype=_INT))
    (_, best, best_idx), dir_rows = jax.lax.scan(
        step, (row0, jnp.asarray(0, _INT), jnp.asarray(0, _INT)), xs
    )
    if with_dirs:
        dirs = jnp.concatenate(
            [jnp.full((1, p), STOP, jnp.int8), dir_rows], axis=0
        )
    else:
        dirs = None
    return dirs, best, best_idx


@functools.partial(jax.jit, static_argnames=("with_dirs",))
def semi_fill(profile: jax.Array, pattern: jax.Array, gap: jax.Array,
              n: jax.Array, m: jax.Array, with_dirs: bool = True):
    """Semi-global ("fit") fill — extension beyond the reference (its
    SEMI_GLOBAL enum is unreachable from its CLI): the pattern aligns
    globally, text end-gaps are free.  Boundary H[0, j] = 0,
    H[i, 0] = -g*i; NW recurrence and tie policy; the score is the
    maximum of the LAST row, first (smallest-column) occurrence.

    Returns (dirs | None, score, best_flat_idx) with the flat index in
    padded (row * P + col) coordinates.
    """
    p = profile.shape[1] + 1
    m_pad = pattern.shape[0]
    gap = jnp.asarray(gap, _INT)
    n = jnp.asarray(n, _INT)
    m = jnp.asarray(m, _INT)
    jcol = jnp.arange(p, dtype=_INT)
    gj = gap * jcol
    # First occurrence over j >= 1 (j = 0 can only tie, and the other
    # engines' trackers never see it); j = 0 only for empty text.
    col_valid = jnp.logical_and(
        jcol <= n, jnp.where(n > 0, jcol >= 1, jcol == 0)
    )
    row0 = jnp.zeros((p,), _INT)

    def step(carry, xs):
        prev, best, best_idx = carry
        pat_i, i = xs
        sub = jax.lax.dynamic_index_in_dim(profile, pat_i, keepdims=False)
        diag = prev[:-1] + sub
        top = prev[1:] - gap
        tmp = jnp.maximum(diag, top)
        tmp_ext = jnp.concatenate([(-gap * i)[None], tmp])
        row = jax.lax.cummax(tmp_ext + gj) - gj
        if with_dirs:
            left = row[:-1] - gap
            d = _direction_row(diag, top, left, local=False)
            dir_row = jnp.concatenate([jnp.full((1,), TOP, jnp.int8), d])
        else:
            dir_row = None
        masked = jnp.where(col_valid, row, PAD_SCORE)
        row_max = jnp.max(masked)
        row_arg = jnp.argmax(masked).astype(_INT)
        hit = i == m
        best = jnp.where(hit, row_max, best)
        best_idx = jnp.where(hit, i * p + row_arg, best_idx)
        return (row, best, best_idx), dir_row

    xs = (pattern.astype(_INT), jnp.arange(1, m_pad + 1, dtype=_INT))
    # m == 0 degenerates to the all-zero init row (score 0 at column 0).
    (_, best, best_idx), dir_rows = jax.lax.scan(
        step, (row0, jnp.asarray(0, _INT), jnp.asarray(0, _INT)), xs
    )
    if with_dirs:
        dirs = jnp.concatenate(
            [jnp.full((1, p), LEFT, jnp.int8), dir_rows], axis=0
        )
    else:
        dirs = None
    return dirs, best, best_idx


@functools.partial(jax.jit, static_argnames=("local", "semi"))
def affine_score_fill(profile: jax.Array, pattern: jax.Array,
                      gap_open: jax.Array, gap_extend: jax.Array,
                      n: jax.Array, m: jax.Array, local: bool = False,
                      semi: bool = False):
    """Affine-gap (Gotoh) score-only fill; a gap run of length L costs
    open + (L-1)*extend (open == extend degenerates to the linear fill).

    The in-row dependency generalizes the linear prefix-max identity:
    with G[j] = max(diag + sub, F[j]) (and the j=0 boundary prepended),

        H[j] = max(G[j], cummax_excl(G + extend*iota)[j]
                         - open - extend*(j-1)),

    which requires open >= extend (re-opening inside a run never helps).
    F carries across rows elementwise.  semi ("fit", exclusive with
    local): free text end-gaps (row 0 = 0) with the affine pattern-gap
    column; score = first maximum of the last row, j >= 1 (the oracle's
    sa_fill_affine algo=2 semantics).  Returns (score, best_flat_idx);
    best is the first row-major maximum for local, the last-row best for
    semi, 0 for global.
    """
    assert not (semi and local)
    p = profile.shape[1] + 1
    m_pad = pattern.shape[0]
    go = jnp.asarray(gap_open, _INT)
    ge = jnp.asarray(gap_extend, _INT)
    n = jnp.asarray(n, _INT)
    m = jnp.asarray(m, _INT)
    neg = jnp.asarray(-(1 << 29), _INT)
    jcol = jnp.arange(p, dtype=_INT)
    ej = ge * jcol
    col_valid = jcol <= n
    if local or semi:
        row0 = jnp.zeros((p,), _INT)
    else:
        row0 = jnp.where(jcol == 0, 0, -go - ge * (jcol - 1))
    f0 = jnp.full((p - 1,), neg, _INT)

    def step(carry, xs):
        prev, f, result, best, best_idx = carry
        pat_i, i = xs
        sub = jax.lax.dynamic_index_in_dim(profile, pat_i, keepdims=False)
        f = jnp.maximum(f - ge, prev[1:] - go)
        g = jnp.maximum(prev[:-1] + sub, f)
        if local:
            g = jnp.maximum(g, 0)
            bound = jnp.zeros((1,), _INT)
        else:
            bound = (-go - ge * (i - 1))[None]
        gx = jnp.concatenate([bound, g])
        z = jax.lax.cummax(gx + ej)
        excl = jnp.concatenate([neg[None], z[:-1]])
        row = jnp.maximum(gx, excl - go - ge * (jcol - 1))
        if local or semi:
            track_row = i <= m if local else i == m
            ok = jnp.logical_and(col_valid, track_row)
            if semi:
                ok = jnp.logical_and(ok, jcol >= 1)
            # semi masks with neg, not PAD_SCORE: unclamped last-row
            # values can undercut PAD_SCORE on huge pairs (local rows
            # are clamped >= 0, so PAD_SCORE is safe there).
            masked = jnp.where(ok, row, neg if semi else PAD_SCORE)
            row_max = jnp.max(masked)
            row_arg = jnp.argmax(masked).astype(_INT)
            improved = row_max > best
            best = jnp.where(improved, row_max, best)
            best_idx = jnp.where(improved, i * p + row_arg, best_idx)
        else:
            result = jnp.where(
                i == m,
                jax.lax.dynamic_index_in_dim(row, n, keepdims=False),
                result,
            )
        return (row, f, result, best, best_idx), None

    xs = (pattern.astype(_INT), jnp.arange(1, m_pad + 1, dtype=_INT))
    init_result = jax.lax.dynamic_index_in_dim(row0, n, keepdims=False)
    best0 = jnp.asarray(0 if local else -(1 << 29), _INT)
    (_, _, result, best, best_idx), _ = jax.lax.scan(
        step,
        (row0, f0, init_result, best0, jnp.asarray(0, _INT)),
        xs,
    )
    if local or semi:
        return best, best_idx
    return result, jnp.asarray(0, _INT)


def nw_score(profile, pattern, gap, n, m):
    """Score-only NW fill (O(row) memory; vmapped by the batch engine)."""
    _, score = nw_fill(profile, pattern, gap, n, m, with_dirs=False)
    return score


def sw_score(profile, pattern, gap, n, m):
    """Score-only SW fill (O(row) memory; vmapped by the batch engine)."""
    _, best, _ = sw_fill(profile, pattern, gap, n, m, with_dirs=False)
    return best


def to_numpy_dirs(dirs: jax.Array) -> np.ndarray:
    """Device->host transfer of the direction matrix, keeping padded width
    (the native traceback accepts padded column strides)."""
    return np.asarray(jax.device_get(dirs)).view(np.uint8)
