"""Pallas TPU kernels for the DP matrix fill.

The hot path of the framework.  Two kernel families:

* :func:`batch_score_pallas` — throughput kernel: up to 4096 pairs per
  grid step, one pair per vector slot, DP cells walked sequentially per
  pair (inter-task SIMD, the SWIPE formulation).  The reference's analog
  is the anti-diagonal wavefront + 32 concurrent streams
  (alignSequenceGPU.cu:73-353); here the whole matrix-fill wave lives in
  VMEM/registers and there is no inter-chunk protocol at all.

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

from .. import config

_INT = jnp.int32
NEG_INF = -(1 << 30)
PAD_SCORE = -(1 << 24)
SUBLANES = 8
TILE_PAIRS = 1024  # pairs per grid step of the inter-pair batch kernel
INTERPAIR_UNROLL = 8  # manual cell-loop unroll of the inter-pair kernel

# Substitution scores are packed 4-per-int32 (biased by +128 into a byte
# each), so the per-cell lookup by text letter is a ceil(K/4)-deep plane
# select + variable byte shift instead of a (K-1)-deep select chain —
# the dominant per-cell cost for protein alphabets (K=23).  Contract:
# |score| <= 127 (all reference matrices are well inside this; the CPU
# oracle has no such limit).
SUB_BIAS = 128


def pack_score_matrix(score_matrix, k_alpha: int) -> np.ndarray:
    """Pack rows of a (K, K) int score matrix into (K, ceil(K/4)) int32
    planes: plane q of row a holds biased bytes sm[a, 4q..4q+3].
    Raises if any |score| > 127."""
    sm = np.asarray(score_matrix)[:k_alpha, :k_alpha].astype(np.int64)
    if np.abs(sm).max(initial=0) > 127:
        raise ValueError(
            "TPU engines require substitution scores in [-127, 127]; "
            "use the CPU engine for larger magnitudes"
        )
    n_planes = -(-k_alpha // 4)
    biased = np.full((k_alpha, 4 * n_planes), SUB_BIAS, dtype=np.int64)
    biased[:, :k_alpha] = sm + SUB_BIAS
    shifts = (np.arange(4) * 8)[None, None, :]
    packed = (biased.reshape(k_alpha, n_planes, 4) << shifts).sum(axis=2)
    return packed.astype(np.uint32).astype(np.int32)


def pack_score_matrix_traced(score_matrix, k_alpha: int) -> jax.Array:
    """pack_score_matrix with traced ops (score_matrix may be a tracer
    under an outer jit; the value contract is then the caller's to keep)."""
    n_planes = -(-k_alpha // 4)
    sm = jnp.asarray(score_matrix, _INT)[:k_alpha, :k_alpha]
    biased = jnp.full((k_alpha, 4 * n_planes), SUB_BIAS, _INT)
    biased = biased.at[:, :k_alpha].set(sm + SUB_BIAS)
    planes = biased.reshape(k_alpha, n_planes, 4)
    return (
        planes[:, :, 0]
        | (planes[:, :, 1] << 8)
        | (planes[:, :, 2] << 16)
        | (planes[:, :, 3] << 24)
    )


def pack_score_matrix_traced_16(score_matrix, k_alpha: int) -> jax.Array:
    """2-bytes-per-plane packing for the int16 cell kernel.

    Planes stay int32 (SMEM scalars) but hold sign-extended int16 values
    (the kernel broadcasts each plane as an int32 vector, then narrows
    to int16 once per row — exact because the value round-trips)."""
    n_planes = -(-k_alpha // 2)
    sm = jnp.asarray(score_matrix, _INT)[:k_alpha, :k_alpha]
    biased = jnp.full((k_alpha, 2 * n_planes), SUB_BIAS, _INT)
    biased = biased.at[:, :k_alpha].set(sm + SUB_BIAS)
    planes = biased.reshape(k_alpha, n_planes, 2)
    packed = planes[:, :, 0] | (planes[:, :, 1] << 8)
    return packed.astype(jnp.int16).astype(_INT)


# int16 cell mode: DP values live in int16 vectors (TPU packs two 16-bit
# lanes per 32-bit VPU lane, doubling the elementwise issue rate — the
# fill is VPU-issue-bound, see BENCH_NOTES MFU table).  -inf sentinels
# sit at -2^14; real DP values must stay strictly above them and clear
# of int16 wraparound, so the mode is gated on a conservative magnitude
# bound over the PADDED shapes (padding slots run the same recurrence).
NEG_16 = -(1 << 14)
INT16_VALUE_CAP = 15_800  # NEG_16 head/tailroom: bound + open + sub < 16384


def int16_cells_ok(n_pad: int, m_pad: int, score_matrix, k_alpha: int,
                   gap, gap_extend=None) -> bool:
    """True when every DP value of every mode fits the int16 cell kernel.

    Conservative bound over the padded widths: |v| <= max|sub|*min(n,m)
    + max(open, extend)*(n+m).  Requires concrete (non-traced) inputs.
    """
    sm = np.asarray(score_matrix)[:k_alpha, :k_alpha]
    max_sub = int(np.abs(sm).max(initial=0))
    g = abs(int(gap))
    ge = abs(int(gap_extend)) if gap_extend is not None else g
    bound = max_sub * min(n_pad, m_pad) + max(g, ge) * (n_pad + m_pad)
    return bound <= INT16_VALUE_CAP


def pack_text_colprof(letters, score_matrix, k_alpha: int) -> jax.Array:
    """Per-position packed substitution COLUMNS for small alphabets.

    Entry j holds the biased bytes ``sm[a, letters[j]] + SUB_BIAS`` for
    a = 0..3 (slots a >= k_alpha hold SUB_BIAS), so a kernel reads the
    substitution score of a DP row with pattern letter ``p`` as
    ``((colprof >> (p << 3)) & 0xFF) - SUB_BIAS`` — one shift whose
    amount is fixed per ROW, vs the (k-1)-deep per-CELL select chain.
    The text side of the classic query-profile trick, restated for
    inter-pair SIMD (each lane is a different pair, so a per-letter
    profile array can't be selected per cell; a per-position packed
    column can).  |scores| <= 127 is the engine-wide contract
    (pack_score_matrix).  Runs as plain fused XLA outside the kernel —
    one elementwise pass over the padded texts.
    """
    assert k_alpha <= 4, "colprof packing only fits 4 byte slots"
    sm = jnp.asarray(score_matrix, _INT)[:k_alpha, :k_alpha]
    lets = jnp.asarray(letters, _INT)
    packed = []
    for c in range(k_alpha):
        v = jnp.asarray(0, _INT)
        for a in range(4):
            byte = (
                (sm[a, c] + SUB_BIAS) & 0xFF
                if a < k_alpha
                else jnp.asarray(SUB_BIAS, _INT)
            )
            v = v | (byte << (8 * a))
        packed.append(v)
    # Same default rule as the kernels' select chains: letters >= k-1
    # (including zero-pad when k_alpha == 1) map to the last column.
    out = packed[k_alpha - 1] + jnp.zeros_like(lets)
    for c in range(k_alpha - 1):
        out = jnp.where(lets == c, packed[c], out)
    return out


def _use_packed_subs(k_alpha: int) -> bool:
    """Packed lookup wins for big alphabets (protein: 2.6x on the batch
    kernel); for k <= 4 the plain (k-1)-deep select chain is faster than
    the variable byte shift on the VPU (measured: 115.6 vs 107.0 GCUPS
    on the DNA batch headline)."""
    return k_alpha > 4


def _packed_lookup(planes: list, letter: jax.Array) -> jax.Array:
    """Substitution score for vector ``letter`` from packed planes."""
    n_planes = len(planes)
    plane = planes[n_planes - 1]
    if n_planes > 1:
        lq = letter >> 2
        for q in range(n_planes - 1):
            plane = jnp.where(lq == q, planes[q], plane)
        lsh = (letter & 3) << 3
    else:
        lsh = letter << 3
    return ((plane >> lsh) & 0xFF) - SUB_BIAS


def _packed_lookup16(planes: list, letter: jax.Array) -> jax.Array:
    """Substitution score for int16 vector ``letter`` from 2-byte planes.

    ``plane >> 8`` sign-extends (planes are sign-correct int16), so the
    ``& 0xFF`` mask recovers the biased high byte exactly."""
    n_planes = len(planes)
    plane = planes[n_planes - 1]
    if n_planes > 1:
        lq = letter >> 1
        for q in range(n_planes - 1):
            plane = jnp.where(lq == q, planes[q], plane)
        lsh = (letter & 1) << 3
    else:
        lsh = letter << 3
    return ((plane >> lsh) & 0xFF) - SUB_BIAS


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


def _interpair_kernel(k_alpha: int, local: bool, n_cols: int, m_rows: int,
                      sub_rows: int, affine: bool, semi: bool,
                      with_dirs: bool, cell16: bool, colprof: bool,
                      uniform: bool,
                      gap_ref, sm_ref, texts_ref, pats_ref, ns_ref, ms_ref,
                      out_ref, dirs_ref, dirs2_ref, row_ref, f_ref,
                      state_scr):
    """Inter-pair batch fill: tile_pairs pairs per grid step, one pair
    per (sublane-row, lane) slot; DP cells walked sequentially per pair.

    This is inter-task SIMD (the SWIPE formulation): since every vector
    slot is an independent pair, the DP dependencies are all sequential
    in the walk order and every op is a dense (sub_rows, 128)
    elementwise op — no prefix scan, no rolls, no reductions anywhere.
    Larger sub_rows amortize the per-cell dependency-chain latency over
    more vector registers.

    with_dirs: the grid gains a second (word-row) dimension — each step
    fills 16 pattern rows and writes one (n_cols, sub_rows, 128) block
    of packed direction words (word w, column j = 2-bit dirs of rows
    16w+1..16w+16 at column j+1, the pair-batched analog of the strip
    kernel's format), plus per-pair best-cell tracking (row-major first
    occurrence, strict improvement — alignSequenceCPU.cpp:191-192).

    colprof: texts_ref holds packed substitution COLUMNS instead of
    letters (pack_text_colprof): per row the shift amount is the
    pattern letter, per cell the lookup is shift+mask+debias (3 ops)
    instead of the (k-1)-deep select chain (6 ops at k=4) — ~20% fewer
    ALU ops/cell on the VPU-issue-bound DNA fill.  k_alpha <= 4 only.

    cell16: DP values, letters and substitution planes live in int16
    vectors (2 lanes per 32-bit VPU lane, ~2x the elementwise issue
    rate).  Length masks, direction words, best-cell indices and the
    carried best score in state_scr stay int32 (words need 32 bits;
    NEG_16 round-trips the state casts exactly).  Per-row scalar work
    stays int32 and is narrowed to int16 vectors once per row.  Callers
    must gate on :func:`int16_cells_ok`.

    uniform: the caller guarantees every REAL pair's lengths equal the
    padded (n_cols, m_rows) exactly (padding PAIRS with ns=0 are still
    allowed — their outputs are garbage and must be discarded, same as
    the non-uniform contract).  The per-cell validity masking then
    vanishes: local tracks acc = max(acc, cur) bare (1 slot instead of
    4), and global/semi skip in-loop tracking entirely — the score is
    read off the final DP row after the loop.  On the issue-bound
    score kernel that is ~20% fewer slots/cell.
    """
    cdt = jnp.int16 if cell16 else _INT
    neg_cell = NEG_16 if cell16 else NEG_INF
    g = gap_ref[0, 0]   # gap penalty (affine: gap-open)
    ge = gap_ref[0, 1]  # gap-extend (affine only)
    nvec = ns_ref[0]  # (sub_rows, 128)
    mvec = ms_ref[0]
    zero = jnp.zeros((sub_rows, 128), cdt)
    # int32 scalar staging vector; MUST alias `zero` on the int32 path so
    # that trace (and thus the warmed compile cache) stays byte-identical.
    zero32 = jnp.zeros((sub_rows, 128), _INT) if cell16 else zero
    neg = jnp.full((sub_rows, 128), NEG_16 if cell16 else NEG_INF // 2, cdt)

    def bcast(scalar):
        # int32 scalar -> (sub_rows, 128) cell-dtype vector (per-row cost).
        v = scalar + zero32
        return v.astype(cdt) if cell16 else v


    if cell16:
        # Gap penalties as int16 vectors so the per-cell subtractions
        # stay at the packed issue rate (int32 scalars would promote).
        g_c = bcast(g)
        ge_c = bcast(ge)
    else:
        g_c = g
        ge_c = ge
    if with_dirs:
        w_blk = pl.program_id(1)
        num_w = pl.num_programs(1)
        rows_here = DIR_ROWS_PER_WORD
        row_off = w_blk * rows_here
        first = w_blk == 0
        last = w_blk == num_w - 1
    else:
        rows_here = m_rows
        row_off = 0
        first = True
        last = True

    # Row 0: H[0, j] = 0 (local/semi) / -g*j (global; affine: -g - j*ge).
    def init_col(j, _):
        if local or semi:
            row_ref[j] = zero
        elif affine:
            row_ref[j] = bcast(-g - ge * j)
        else:
            row_ref[j] = bcast(-g * (j + 1))
        if affine:
            f_ref[j] = neg
        return 0

    def _init():
        jax.lax.fori_loop(0, n_cols, init_col, 0)
        if with_dirs:
            state_scr[0] = jnp.full((sub_rows, 128), neg_cell, _INT)
            state_scr[1] = zero32  # best_i
            state_scr[2] = zero32  # best_j

    if with_dirs:
        pl.when(first)(_init)
    else:
        _init()

    # sm_ref columns: packed planes (big alphabets; 2 bytes per int16
    # plane in cell16 mode, 4 per int32 otherwise) or raw scores (k<=4).
    if _use_packed_subs(k_alpha):
        n_coef = -(-k_alpha // 2) if cell16 else -(-k_alpha // 4)
    else:
        n_coef = k_alpha

    def row_step(ri, carry):
        acc, bi, bj = carry
        i = row_off + ri  # 1-based DP row
        # pats block: whole pattern (score-only) or this word-row's 16
        # rows (with_dirs 2D grid) — index is block-local either way.
        pat = pats_ref[i - 1 - row_off]  # pattern letter of row i per pair
        # Per-row substitution coefficients, selected by pattern letter:
        # colprof shift amount (texts_ref holds packed columns), packed
        # planes (see pack_score_matrix) or raw per-text-letter scores
        # sm[pat, c].
        planes = []
        if colprof:
            row_lsh = pat << 3  # per-row byte-slot shift, 0 extra/cell
        for q in range(n_coef if not colprof else 0):
            if cell16:
                # Mosaic (v5e) rejects selects whose operands are BOTH
                # replicated-layout constants ("Invalid relayout: ...
                # replicated in destination but not in source" — the
                # select's result layout goes replicated and the mask
                # can't follow), which is exactly select(pat==a, scalar,
                # zeros).  Masked sum avoids selects entirely; exactly
                # one letter matches, unmatched (pad) rows get 0 like
                # the select chain did.  Per-row cost, int16 issue rate.
                cc = zero
                for a in range(k_alpha):
                    cc = cc + (pat == a).astype(cdt) * sm_ref[a, q].astype(cdt)
                planes.append(cc)
            else:
                cc = zero32
                for a in range(k_alpha):
                    cc = jnp.where(pat == a, sm_ref[a, q], cc)
                planes.append(cc)

        row_live = None if uniform else (i <= mvec)
        if local:
            s_i0 = s_im1_0 = zero
        elif affine:
            # H[i, 0] = -(open + (i-1)*extend); H[0, 0] = 0.
            s_i0 = bcast(-g - ge * (i - 1))
            s_im1_0 = jnp.where(i == 1, zero, bcast(-g - ge * (i - 2)))
        else:
            s_i0 = bcast(-g * i)
            s_im1_0 = bcast(-g * (i - 1))

        def cell_step(j, carry):
            left, diag_carry, e, acc, bi, bj = carry
            text_j = texts_ref[j]
            if colprof:
                # texts_ref[j] is a packed substitution column; the
                # shift amount is fixed per row (pattern letter).
                sub = ((text_j >> row_lsh) & 0xFF) - SUB_BIAS
            elif _use_packed_subs(k_alpha):
                lookup = _packed_lookup16 if cell16 else _packed_lookup
                sub = lookup(planes, text_j)
            else:
                sub = planes[k_alpha - 1]
                for c in range(k_alpha - 1):
                    sub = jnp.where(text_j == c, planes[c], sub)
            prev_j = row_ref[j]
            diag = diag_carry + sub
            if affine:
                e_ext = e - ge_c
                e_open = left - g_c
                e = jnp.maximum(e_ext, e_open)
                f_ext = f_ref[j] - ge_c
                f_open = prev_j - g_c
                f = jnp.maximum(f_ext, f_open)
                f_ref[j] = f
                gap_best = jnp.maximum(e, f)
            else:
                gap_best = jnp.maximum(prev_j, left) - g_c
            cur = jnp.maximum(diag, gap_best)
            if local:
                cur = jnp.maximum(cur, 0)
            row_ref[j] = cur
            if with_dirs:
                # Reference tie policy: DIAG only if strictly greater
                # than both gap moves; LEFT beats TOP on gap ties (for
                # affine, E beats F — oracle.cpp sa_align_affine).
                is_diag = diag > gap_best
                gl, gt = (e, f) if affine else (left, prev_j)
                is_left = jnp.logical_and(
                    jnp.logical_not(is_diag), gl >= gt
                )
                if cell16:
                    # Select chains over small constants have
                    # replicated-layout operands, which Mosaic's select
                    # rejects (see plane selection above); is_diag and
                    # is_left are mutually exclusive, so the 2-bit code
                    # is plain arithmetic: DIAG->1, LEFT->0, TOP->2.
                    id16 = is_diag.astype(cdt)
                    il16 = is_left.astype(cdt)
                    d16 = 2 - id16 - (il16 << 1)
                    if local:
                        d16 = jnp.where(
                            jnp.maximum(diag, gap_best) > 0, d16, 3
                        )
                    d = d16.astype(_INT)
                else:
                    d = jnp.where(
                        is_diag, 1, jnp.where(is_left, 0, 2)
                    ).astype(_INT)
                    if local:
                        d = jnp.where(
                            jnp.maximum(diag, gap_best) > 0, d, 3
                        )
                word = d << (2 * ((i - 1) % DIR_ROWS_PER_WORD))
                first_of_word = (i - 1) % DIR_ROWS_PER_WORD == 0
                dirs_ref[j] = jnp.where(
                    first_of_word, word, dirs_ref[j] | word
                )
                if affine:
                    # Run-continuation bits: stay in a gap run iff
                    # extending strictly beats reopening from H.
                    if cell16:
                        d2 = (
                            (e_ext > e_open).astype(cdt)
                            | ((f_ext > f_open).astype(cdt) << 1)
                        ).astype(_INT)
                    else:
                        d2 = (e_ext > e_open).astype(_INT) | (
                            (f_ext > f_open).astype(_INT) << 1
                        )
                    word2 = d2 << (2 * ((i - 1) % DIR_ROWS_PER_WORD))
                    dirs2_ref[j] = jnp.where(
                        first_of_word, word2, dirs2_ref[j] | word2
                    )
            # cell16: scalar select operands are Mosaic-hostile on the
            # int16 layouts (see plane selection) — stage them through
            # hoisted vectors (`neg` IS full(neg_cell) in cell16).
            neg_cell_v = neg if cell16 else neg_cell
            if local:
                if uniform:
                    # Every cell of a real pair is valid: track bare.
                    cand = cur
                else:
                    ok = jnp.logical_and(j < nvec, row_live)
                    cand = jnp.where(ok, cur, neg_cell_v)
                if with_dirs:
                    improved = cand > acc
                    iv = zero32 + i if cell16 else i
                    jv = zero32 + (j + 1) if cell16 else j + 1
                    bi = jnp.where(improved, iv, bi)
                    bj = jnp.where(improved, jv, bj)
                acc = jnp.maximum(acc, cand)
            elif semi and not uniform:
                # Max over the last pattern row (fit alignment).
                ok = jnp.logical_and(
                    jnp.logical_and(row_live, i == mvec), j < nvec
                )
                cand = jnp.where(ok, cur, neg_cell_v)
                if with_dirs:
                    improved = cand > acc
                    iv = zero32 + i if cell16 else i
                    jv = zero32 + (j + 1) if cell16 else j + 1
                    bi = jnp.where(improved, iv, bi)
                    bj = jnp.where(improved, jv, bj)
                acc = jnp.maximum(acc, cand)
            elif not uniform:
                hit = jnp.logical_and(row_live, jnp.logical_and(i == mvec, j == nvec - 1))
                acc = jnp.where(hit, cur, acc)
            # uniform global/semi: no in-loop tracking at all — the
            # score is read off the final DP row in _finish.
            return cur, prev_j, e, acc, bi, bj

        # Mosaic fori supports only unroll=1/full; unroll manually to
        # amortize loop overhead over the 3-op cells.
        unroll = INTERPAIR_UNROLL
        while n_cols % unroll:
            unroll //= 2

        def cell_block(b, carry):
            for u in range(unroll):
                carry = cell_step(b * unroll + u, carry)
            return carry

        _, _, _, acc, bi, bj = jax.lax.fori_loop(
            0, n_cols // unroll, cell_block,
            (s_i0, s_im1_0, neg, acc, bi, bj),
        )
        return acc, bi, bj

    if with_dirs:
        acc0 = state_scr[0].astype(cdt) if cell16 else state_scr[0]
        bi0, bj0 = state_scr[1], state_scr[2]
    else:
        acc0, bi0, bj0 = jnp.full((sub_rows, 128), neg_cell, cdt), zero, zero
    acc, bi, bj = jax.lax.fori_loop(
        1, rows_here + 1, row_step, (acc0, bi0, bj0)
    )
    if with_dirs:
        state_scr[0] = acc.astype(_INT) if cell16 else acc
        state_scr[1] = bi
        state_scr[2] = bj

    def _finish():
        if uniform and not local:
            # Nothing was tracked in-loop; after the last row,
            # row_ref[j] = H[m_rows, j+1].  Global score is the corner
            # cell; semi scans the final row (max + first occurrence,
            # same policy as the in-loop tracker restricted to i = m).
            # O(n_cols) vector ops — noise next to the O(n*m) fill.
            if semi:
                def scan_j(j, carry):
                    a, bjv = carry
                    cand = row_ref[j]
                    if with_dirs:
                        jv = zero32 + (j + 1) if cell16 else j + 1
                        bjv = jnp.where(cand > a, jv, bjv)
                    a = jnp.maximum(a, cand)
                    return a, bjv
                seed = jnp.full((sub_rows, 128), neg_cell, cdt)
                a, bjv = jax.lax.fori_loop(
                    0, n_cols, scan_j, (seed, zero32)
                )
                out_ref[0] = a.astype(_INT) if cell16 else a
            else:
                final = row_ref[n_cols - 1]
                out_ref[0] = final.astype(_INT) if cell16 else final
                bjv = zero32 + n_cols
            if with_dirs:
                out_ref[1] = zero32 + m_rows  # best_i = m (real pairs)
                out_ref[2] = bjv  # garbage for global, like bi/bj were
            return
        final = jnp.maximum(acc, 0) if local else acc
        out_ref[0] = final.astype(_INT) if cell16 else final
        if with_dirs:
            out_ref[1] = bi
            out_ref[2] = bj

    if with_dirs:
        pl.when(last)(_finish)
    else:
        _finish()


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_alpha", "local", "semi", "tile_pairs", "cell16", "colprof",
        "uniform", "interpret"
    ),
)
def batch_score_pallas(texts, patterns, ns, ms, score_matrix, gap,
                       k_alpha: int, local: bool = False,
                       semi: bool = False,
                       tile_pairs: int | None = None,
                       gap_extend=None,
                       cell16: bool = False,
                       colprof: bool | None = None,
                       uniform: bool = False,
                       interpret: bool = False):
    """Optimal scores for a padded batch (inter-pair Pallas kernel).

    Args:
      texts: (B, N) int32, B multiple of 1024 (pad with zero-length pairs).
      patterns: (B, M) int32.
      ns, ms: (B,) real lengths (0 allowed for padding pairs, which then
        produce garbage scores — slice them off).
      score_matrix: (K, K) int32; gap: scalar int32.
      k_alpha: static alphabet size; VMEM sizing favors small alphabets.
      local: Smith-Waterman when True.
      semi: semi-global ("fit") when True — H[0, j] = 0, score = max of
        the last pattern row (mutually exclusive with local).
      gap_extend: when given, affine (Gotoh) gap costs — a run of length
        L costs gap + (L-1)*gap_extend (``gap`` is then the open cost);
        None keeps the reference's linear model.
      cell16: run the DP in int16 vectors (~2x VPU issue rate, default
        tile doubles to 8192 pairs at the same register footprint).
        Caller must gate on :func:`int16_cells_ok` over the PADDED
        widths or scores silently wrap.
      colprof: pass packed per-position substitution columns instead of
        letters (pack_text_colprof) — shift+mask lookup, ~3 fewer ALU
        ops/cell at k <= 4.  None = auto (on for k <= 4 int32 cells,
        SEQALIGN_DNA_COLPROF=0 disables).
      uniform: caller guarantees every REAL pair has ns == N and
        ms == M exactly (zero-length padding pairs still allowed, their
        scores are garbage).  Drops the per-cell validity masking —
        ~3 fewer ops/cell on the issue-bound fill.  WRONG RESULTS if
        the guarantee is violated; callers compute it from host-side
        lengths (see BatchAligner.score / bench.py).

    Returns (B,) int32 scores.
    """
    if colprof is None:
        colprof = (
            k_alpha <= 4 and not cell16 and config.dna_colprof()
        )
    assert not (colprof and cell16)
    assert not (colprof and k_alpha > 4)
    b, n = texts.shape
    m = patterns.shape[1]
    if tile_pairs is None:
        # Bigger tiles amortize the per-cell dependency-chain latency
        # over more vector registers: 4096 pairs/step measures 651 GCUPS
        # vs 119 at 1024 (DNA SW 512^2); 8192 regresses (VMEM pressure).
        # int16 cells are half-width, so the sweet spot doubles.
        tiles = (8192, 4096, 2048, 1024, 512, 256, 128) if cell16 else (
            4096, 2048, 1024, 512, 256, 128
        )
        tile_pairs = next(t for t in tiles if b % t == 0)
    assert tile_pairs % 128 == 0
    assert b % tile_pairs == 0, f"batch {b} not a multiple of {tile_pairs}"
    num_tiles = b // tile_pairs
    sub_rows = tile_pairs // 128
    cdt = jnp.int16 if cell16 else _INT

    # Pair-major -> slot-major: (tiles, N, sub_rows, 128) so each kernel
    # read of texts[j] is one dense (sub_rows, 128) vector of tile_pairs
    # pairs' letters.
    def to_slots(x, width):
        return (
            x.astype(cdt)
            .reshape(num_tiles, tile_pairs, width)
            .transpose(0, 2, 1)
            .reshape(num_tiles * width, sub_rows, 128)
        )

    texts_in = (
        pack_text_colprof(texts, score_matrix, k_alpha)
        if colprof
        else texts
    )
    texts_s = to_slots(texts_in, n)
    pats_s = to_slots(patterns, m)
    ns_s = jnp.asarray(ns, _INT).reshape(num_tiles, 1, sub_rows, 128)
    ms_s = jnp.asarray(ms, _INT).reshape(num_tiles, 1, sub_rows, 128)
    affine = gap_extend is not None
    gap_arr = jnp.stack(
        [jnp.asarray(gap, _INT),
         jnp.asarray(gap_extend if affine else gap, _INT)]
    ).reshape(1, 2)
    if _use_packed_subs(k_alpha):
        if cell16:
            sm = pack_score_matrix_traced_16(score_matrix, k_alpha)
        else:
            sm = pack_score_matrix_traced(score_matrix, k_alpha)
    else:
        sm = jnp.asarray(score_matrix, _INT)[:k_alpha, :k_alpha]

    assert not (semi and local)
    kernel = functools.partial(
        _interpair_kernel, k_alpha, local, n, m, sub_rows, affine, semi,
        False, cell16, colprof, uniform,
    )
    out, _, _ = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (k_alpha, sm.shape[1]), lambda t: (0, 0),
                memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((n, sub_rows, 128), lambda t: (t, 0, 0)),
            pl.BlockSpec((m, sub_rows, 128), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, sub_rows, 128), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, sub_rows, 128), lambda t: (t, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, sub_rows, 128), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, sub_rows, 128), lambda t: (0, 0, 0)),
            pl.BlockSpec((1, sub_rows, 128), lambda t: (0, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles, sub_rows, 128), _INT),
            jax.ShapeDtypeStruct((1, sub_rows, 128), _INT),  # dirs dummy
            jax.ShapeDtypeStruct((1, sub_rows, 128), _INT),  # dirs2 dummy
        ),
        scratch_shapes=[
            pltpu.VMEM((n, sub_rows, 128), cdt),
            pltpu.VMEM((n if affine else 1, sub_rows, 128), cdt),
            pltpu.VMEM((1, sub_rows, 128), _INT),
        ],
        # Text/pattern blocks + row state scale with tile_pairs; lift the
        # compiler's default 16 MiB scoped-VMEM cap when they need more.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(gap_arr, sm, texts_s, pats_s,
      ns_s.reshape(num_tiles, sub_rows, 128),
      ms_s.reshape(num_tiles, sub_rows, 128))
    # Slot-major -> pair order.
    return out.reshape(num_tiles, tile_pairs).reshape(-1)


DIRS_TILE_PAIRS = 2048  # pairs/grid-step of the dirs-emitting batch kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_alpha", "local", "semi", "tile_pairs", "cell16", "colprof",
        "uniform", "interpret"
    ),
)
def batch_fill_dirs_pallas(texts, patterns, ns, ms, score_matrix, gap,
                           k_alpha: int, local: bool = False,
                           semi: bool = False,
                           tile_pairs: int = DIRS_TILE_PAIRS,
                           gap_extend=None,
                           cell16: bool = False,
                           colprof: bool | None = None,
                           uniform: bool = False,
                           interpret: bool = False):
    """Batched fill emitting packed direction words (inter-pair kernel).

    The end-to-end batch path: one dispatch fills a whole padded batch
    AND leaves per-pair 2-bit direction words in HBM for the batched
    device traceback (ops/batch_traceback.py).  The reference can only
    loop full alignments one request at a time
    (tests/benchmarks.cu:271-332).

    Args: as batch_score_pallas; patterns' padded width must be a
    multiple of 16 (DIR_ROWS_PER_WORD).  gap_extend switches to affine
    (Gotoh) costs and additionally emits the E/F run-continuation
    bitplane (same encoding as the wavefront affine kernel).  cell16
    narrows the DP state to int16 (direction words, best cells and
    scores stay int32 — identical output layout); callers must gate on
    :func:`int16_cells_ok` over the padded widths.  uniform: as
    batch_score_pallas (all real pairs exactly (N, M)) — best_is/best_js
    keep identical semantics (global stays garbage-by-contract).

    Returns (scores, best_is, best_js, dirs, dirs2):
      scores: (B,) int32 (local scores floored at 0 like the reference);
      best_is/best_js: (B,) int32 — SW/semi best cell (first row-major
        occurrence; garbage for global — the walk starts at (m, n));
      dirs: (num_tiles, m/16, n, sub_rows, 128) int32 — word (t, w, j)
        holds the 2-bit directions of DP rows 16w+1..16w+16 at column
        j+1 of every pair in tile t (slot = sublane-row*128 + lane);
      dirs2: same layout for the affine continuation bits (bit 0 E-run,
        bit 1 F-run), or None for linear gaps.
    """
    if colprof is None:
        colprof = (
            k_alpha <= 4 and not cell16 and config.dna_colprof()
        )
    assert not (colprof and cell16)
    assert not (colprof and k_alpha > 4)
    b, n = texts.shape
    m = patterns.shape[1]
    assert m % DIR_ROWS_PER_WORD == 0, "pad patterns to a multiple of 16"
    assert tile_pairs % 128 == 0 and b % tile_pairs == 0
    num_tiles = b // tile_pairs
    sub_rows = tile_pairs // 128
    num_w = m // DIR_ROWS_PER_WORD
    cdt = jnp.int16 if cell16 else _INT

    def to_slots(x, width):
        return (
            x.astype(cdt)
            .reshape(num_tiles, tile_pairs, width)
            .transpose(0, 2, 1)
            .reshape(num_tiles * width, sub_rows, 128)
        )

    texts_in = (
        pack_text_colprof(texts, score_matrix, k_alpha)
        if colprof
        else texts
    )
    texts_s = to_slots(texts_in, n)
    pats_s = to_slots(patterns, m)
    affine = gap_extend is not None
    gap_arr = jnp.stack(
        [jnp.asarray(gap, _INT),
         jnp.asarray(gap_extend if affine else gap, _INT)]
    ).reshape(1, 2)
    if _use_packed_subs(k_alpha):
        if cell16:
            sm = pack_score_matrix_traced_16(score_matrix, k_alpha)
        else:
            sm = pack_score_matrix_traced(score_matrix, k_alpha)
    else:
        sm = jnp.asarray(score_matrix, _INT)[:k_alpha, :k_alpha]

    assert not (semi and local)
    kernel = functools.partial(
        _interpair_kernel, k_alpha, local, n, m, sub_rows, affine, semi,
        True, cell16, colprof, uniform,
    )
    dirs_spec = pl.BlockSpec(
        (n, sub_rows, 128), lambda t, w: (t * num_w + w, 0, 0)
    )
    dirs_shape = jax.ShapeDtypeStruct(
        (num_tiles * num_w * n, sub_rows, 128), _INT
    )
    if affine:
        dirs2_spec, dirs2_shape = dirs_spec, dirs_shape
    else:
        dirs2_spec = pl.BlockSpec(
            (1, sub_rows, 128), lambda t, w: (0, 0, 0)
        )
        dirs2_shape = jax.ShapeDtypeStruct((1, sub_rows, 128), _INT)
    out, dirs, dirs2 = pl.pallas_call(
        kernel,
        grid=(num_tiles, num_w),
        in_specs=[
            pl.BlockSpec(
                (1, 2), lambda t, w: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (k_alpha, sm.shape[1]), lambda t, w: (0, 0),
                memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((n, sub_rows, 128), lambda t, w: (t, 0, 0)),
            pl.BlockSpec(
                (DIR_ROWS_PER_WORD, sub_rows, 128),
                lambda t, w: (t * num_w + w, 0, 0),
            ),
            pl.BlockSpec((1, sub_rows, 128), lambda t, w: (t, 0, 0)),
            pl.BlockSpec((1, sub_rows, 128), lambda t, w: (t, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((3, sub_rows, 128), lambda t, w: (t, 0, 0)),
            dirs_spec,
            dirs2_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles * 3, sub_rows, 128), _INT),
            dirs_shape,
            dirs2_shape,
        ),
        scratch_shapes=[
            pltpu.VMEM((n, sub_rows, 128), cdt),
            pltpu.VMEM((n if affine else 1, sub_rows, 128), cdt),
            pltpu.VMEM((3, sub_rows, 128), _INT),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(gap_arr, sm, texts_s, pats_s,
      jnp.asarray(ns, _INT).reshape(num_tiles, sub_rows, 128),
      jnp.asarray(ms, _INT).reshape(num_tiles, sub_rows, 128))
    out = out.reshape(num_tiles, 3, tile_pairs)
    scores = out[:, 0, :].reshape(-1)
    best_is = out[:, 1, :].reshape(-1)
    best_js = out[:, 2, :].reshape(-1)
    dirs = dirs.reshape(num_tiles, num_w, n, sub_rows, 128)
    dirs2 = (
        dirs2.reshape(num_tiles, num_w, n, sub_rows, 128)
        if affine
        else None
    )
    return scores, best_is, best_js, dirs, dirs2


# ----------------------------------------------------------------------------
# Single-pair fill kernel (directions + score).

DIR_ROWS_PER_WORD = 16  # 2-bit directions, 16 DP rows packed per int32
ROWS_PER_STEP = 128     # DP rows per grid step
MAX_CHUNK_ROWS = 16384  # per-call row cap (pattern + boundary col live in SMEM)


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


def _strip_kernel(local: bool, with_dirs: bool,
                  gap_ref, nm_ref, base_ref, lc_ref, prof_ref, pats_ref,
                  prev_in_ref, state_in_ref,
                  dirs_ref, state_ref, prev_out_ref, rcol_ref,
                  prev_ref, saved_ref):
    """Fill one (row-range x column-strip) region of the DP matrix.

    Grid: sequential row-chunks of ROWS_PER_STEP rows.  Boundary data:
      * lc_ref (1, R+1) SMEM — left-boundary column S[i, strip_off] for
        this chunk's rows (entry r is row base+t*R+r);
      * prev_in_ref (8, L) — the DP row above this strip region;
      * state_in_ref (1, 4) SMEM — [best, best_i, best_j, score] carried
        from previous regions.
    Outputs: packed direction words, final state, the strip's last DP row
    (prev_out) and right-boundary column (rcol, one scalar per row).
    State semantics replicate the reference exactly: SW best updates only
    on strictly-greater scores in row-major order
    (alignSequenceCPU.cpp:191-192).
    """
    t = pl.program_id(0)
    num_steps = pl.num_programs(0)
    l = prof_ref.shape[2]
    g = gap_ref[0, 0]
    n = nm_ref[0, 0]
    m = nm_ref[0, 1]
    row_base = base_ref[0, 0]
    strip_off = base_ref[0, 1]

    lane = jax.lax.broadcasted_iota(_INT, (SUBLANES, l), 1)
    sub = jax.lax.broadcasted_iota(_INT, (SUBLANES, l), 0)
    sub_col = jax.lax.broadcasted_iota(_INT, (SUBLANES, 1), 0)
    jpos = strip_off + sub * l + lane + 1  # global DP column at (sublane, lane)
    gj = g * jpos
    pos00 = jnp.logical_and(lane == 0, sub == 0)
    col_ok = jpos <= n
    pos_last = jpos == strip_off + SUBLANES * l  # strip's last position

    @pl.when(t == 0)
    def _init():
        prev_ref[:, :] = prev_in_ref[:, :]
        state_ref[0, 0] = state_in_ref[0, 0]
        state_ref[0, 1] = state_in_ref[0, 1]
        state_ref[0, 2] = state_in_ref[0, 2]
        state_ref[0, 3] = state_in_ref[0, 3]
        if local:
            saved_ref[:, :] = jnp.full((SUBLANES, l), NEG_INF, _INT)

    def shift_right(x, boundary):
        rolled = pltpu.roll(x, 1, axis=1)
        lastcol = pltpu.roll(x[:, l - 1 : l], 1, axis=0)
        y = jnp.where(lane == 0, lastcol, rolled)
        return jnp.where(pos00, boundary, y)

    def row_step(r, carry):
        prev, dirpack = carry
        rr = t * ROWS_PER_STEP + r   # row index within this call
        i = row_base + rr + 1
        pat = pats_ref[0, rr]
        sub_scores = prof_ref[pat]
        lc_above = lc_ref[0, rr]      # S[i-1, strip_off]
        lc_here = lc_ref[0, rr + 1]   # S[i,   strip_off]

        diag = shift_right(prev, lc_above) + sub_scores
        top = prev - g
        tmp = jnp.maximum(diag, top)
        if local:
            tmp = jnp.maximum(tmp, 0)
        b_vec = tmp + gj
        b_vec = jnp.where(
            pos00, jnp.maximum(b_vec, lc_here + g * strip_off), b_vec
        )
        pc = _prefix_max_lanes(b_vec, lane)
        excl = _sublane_excl_prefix_max(pc[:, l - 1 : l], sub_col)
        row = jnp.maximum(pc, excl) - gj

        if with_dirs:
            # Directions under the reference tie policy.
            left = shift_right(row, lc_here) - g
            gap_best = jnp.maximum(left, top)
            is_diag = diag > gap_best
            d = jnp.where(is_diag, 1, jnp.where(left >= top, 0, 2)).astype(_INT)
            if local:
                best_un = jnp.maximum(diag, gap_best)
                d = jnp.where(best_un > 0, d, 3)
        if with_dirs:
            word = d << (2 * (r % DIR_ROWS_PER_WORD))
            dirpack = jnp.where(
                r % DIR_ROWS_PER_WORD == 0, word, dirpack | word
            )

            @pl.when(r % DIR_ROWS_PER_WORD == DIR_ROWS_PER_WORD - 1)
            def _flush():
                dirs_ref[r // DIR_ROWS_PER_WORD] = dirpack

        # Right-boundary column for the next strip.
        rcol_ref[0, rr] = jnp.max(jnp.where(pos_last, row, NEG_INF))

        if local:
            masked = jnp.where(col_ok, row, NEG_INF)
            rm = jnp.max(masked)
            improved = jnp.logical_and(rm > state_ref[0, 0], i <= m)

            @pl.when(improved)
            def _track():
                state_ref[0, 0] = rm
                state_ref[0, 1] = i
                saved_ref[:, :] = masked
        else:
            @pl.when(i == m)
            def _capture():
                state_ref[0, 3] = jnp.maximum(
                    state_ref[0, 3],
                    jnp.max(jnp.where(jpos == n, row, NEG_INF)),
                )
        return row, dirpack

    dirpack0 = jnp.zeros((SUBLANES, l), _INT)
    prev, _ = jax.lax.fori_loop(
        0, ROWS_PER_STEP, row_step, (prev_ref[:, :], dirpack0)
    )
    prev_ref[:, :] = prev

    @pl.when(t == num_steps - 1)
    def _finish():
        prev_out_ref[:, :] = prev_ref[:, :]
        if local:
            # First (row-major) column of the best value in the winning
            # row — but only if the best improved within this region;
            # otherwise the carried (i, j) stand.
            improved_here = state_ref[0, 0] > state_in_ref[0, 0]
            cand = jnp.where(
                saved_ref[:, :] == state_ref[0, 0],
                jpos,
                jnp.asarray(1 << 30, _INT),
            )
            state_ref[0, 2] = jnp.where(
                improved_here, jnp.min(cand), state_in_ref[0, 2]
            )


def _zeros_state(local: bool) -> np.ndarray:
    # [best, best_i, best_j, score]; SW best starts at 0 with cell (0, 0)
    # like the reference's maxScore/maxIJ init.
    return np.array([[0, 0, 0, NEG_INF]], dtype=np.int32)


@functools.partial(
    jax.jit, static_argnames=("local", "with_dirs", "interpret")
)
def strip_fill_pallas(profile, pattern, gap, n, m, row_base, strip_off,
                      left_col, prev_row, state, local: bool = False,
                      with_dirs: bool = True, interpret: bool = False):
    """Fill a (rows x strip) region; see _strip_kernel.

    Args:
      profile: (K, 8, L) int32 strip profile (PAD_SCORE beyond column n).
      pattern: (M_chunk,) int32, multiple of ROWS_PER_STEP.
      gap, n, m: scalars (n, m = real global lengths).
      row_base, strip_off: region origin (rows processed are
        row_base+1 .. row_base+M_chunk; columns strip_off+1 ..
        strip_off+8L).
      left_col: (M_chunk+1,) int32 — S[row_base+r, strip_off] for
        r = 0..M_chunk.
      prev_row: (8, L) int32 — DP row row_base of this strip.
      state: (1, 4) int32 — carried [best, best_i, best_j, score].

    Returns (dirs_packed, prev_out, right_col, state_out).
    """
    k_alpha, sublanes, l = profile.shape
    assert sublanes == SUBLANES
    m_chunk = pattern.shape[0]
    assert m_chunk % ROWS_PER_STEP == 0
    assert m_chunk <= MAX_CHUNK_ROWS, (
        f"m_chunk {m_chunk} exceeds SMEM budget; loop over blocks"
    )
    num_steps = m_chunk // ROWS_PER_STEP

    gap_arr = jnp.asarray(gap, _INT).reshape(1, 1)
    nm = jnp.stack([jnp.asarray(n, _INT), jnp.asarray(m, _INT)]).reshape(1, 2)
    base = jnp.stack(
        [jnp.asarray(row_base, _INT), jnp.asarray(strip_off, _INT)]
    ).reshape(1, 2)
    pats = pattern.astype(_INT).reshape(1, m_chunk)
    lc_win = jnp.asarray(left_col, _INT).reshape(1, m_chunk + 1)

    kernel = functools.partial(_strip_kernel, local, with_dirs)
    words_per_step = ROWS_PER_STEP // DIR_ROWS_PER_WORD
    if with_dirs:
        dirs_shape = (m_chunk // DIR_ROWS_PER_WORD, SUBLANES, l)
        dirs_spec = pl.BlockSpec(
            (words_per_step, SUBLANES, l), lambda t: (t, 0, 0)
        )
    else:
        # Score-only: a single dummy block, never written.
        dirs_shape = (1, SUBLANES, l)
        dirs_spec = pl.BlockSpec((1, SUBLANES, l), lambda t: (0, 0, 0))
    smem = lambda shape, idx: pl.BlockSpec(  # noqa: E731
        shape, idx, memory_space=pltpu.SMEM
    )
    dirs, state_out, prev_out, rcol = pl.pallas_call(
        kernel,
        grid=(num_steps,),
        in_specs=[
            smem((1, 1), lambda t: (0, 0)),
            smem((1, 2), lambda t: (0, 0)),
            smem((1, 2), lambda t: (0, 0)),
            smem((1, m_chunk + 1), lambda t: (0, 0)),
            pl.BlockSpec((k_alpha, SUBLANES, l), lambda t: (0, 0, 0)),
            smem((1, m_chunk), lambda t: (0, 0)),
            pl.BlockSpec((SUBLANES, l), lambda t: (0, 0)),
            smem((1, 4), lambda t: (0, 0)),
        ],
        out_specs=(
            dirs_spec,
            smem((1, 4), lambda t: (0, 0)),
            pl.BlockSpec((SUBLANES, l), lambda t: (0, 0)),
            smem((1, m_chunk), lambda t: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(dirs_shape, _INT),
            jax.ShapeDtypeStruct((1, 4), _INT),
            jax.ShapeDtypeStruct((SUBLANES, l), _INT),
            jax.ShapeDtypeStruct((1, m_chunk), _INT),
        ),
        scratch_shapes=[
            pltpu.VMEM((SUBLANES, l), _INT),
            pltpu.VMEM((SUBLANES, l), _INT),
        ],
        interpret=interpret,
    )(gap_arr, nm, base, lc_win, profile.astype(_INT), pats,
      jnp.asarray(prev_row, _INT), jnp.asarray(state, _INT))
    return dirs, prev_out, rcol.reshape(-1), state_out


def nw_boundary_col(row_base: int, m_chunk: int, gap: int,
                    local: bool) -> np.ndarray:
    """Left boundary for strip 0: S[i, 0] = 0 (local) / -g*i (global)."""
    rows = np.arange(row_base, row_base + m_chunk + 1, dtype=np.int64)
    if local:
        return np.zeros_like(rows, dtype=np.int32)
    return (-gap * rows).astype(np.int32)


def init_prev_row(l: int, strip_off: int, gap: int, local: bool) -> np.ndarray:
    """DP row 0 of a strip: S[0, j] = 0 (local) / -g*j (global)."""
    jpos = strip_off + np.arange(1, SUBLANES * l + 1, dtype=np.int64)
    if local:
        return np.zeros((SUBLANES, l), np.int32)
    return (-gap * jpos).astype(np.int32).reshape(SUBLANES, l)


def pair_fill_pallas(profile, pattern, gap, n, m, local: bool = False,
                     interpret: bool = False):
    """Single-pair DP fill -> packed direction matrix + score (+ best cell).

    Single-region convenience wrapper over strip_fill_pallas.

    Returns (dirs_packed, score, best_i, best_j):
      dirs_packed: (M_pad/16, 8, L) int32 — word w at position p holds the
        2-bit directions of DP rows 16w+1 .. 16w+16 at column p+1
        (bits 2k.. for row 16w+k+1); row-major bytes are natural column
        order, so numpy can reshape to (M_pad/16, P).
    """
    k_alpha, sublanes, l = profile.shape
    m_pad = pattern.shape[0]
    gap_t = jnp.asarray(gap, _INT)
    if local:
        lc = jnp.zeros((m_pad + 1,), _INT)
        prev0 = jnp.zeros((SUBLANES, l), _INT)
    else:
        lc = -gap_t * jnp.arange(m_pad + 1, dtype=_INT)
        prev0 = (
            -gap_t * jnp.arange(1, SUBLANES * l + 1, dtype=_INT)
        ).reshape(SUBLANES, l)
    state0 = jnp.asarray(_zeros_state(local))
    dirs, _, _, state = strip_fill_pallas(
        profile, pattern, gap, n, m, 0, 0, lc, prev0, state0,
        local=local, interpret=interpret,
    )
    if local:
        return dirs, state[0, 0], state[0, 1], state[0, 2]
    return dirs, state[0, 3], state[0, 1], state[0, 2]


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
