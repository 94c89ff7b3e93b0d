"""Sequence-parallel single-pair alignment across a device mesh.

One long pair's DP matrix is split across devices and filled as a
pipelined diagonal wavefront — the multi-chip analog of the reference's
chunked CUDA-stream pipeline with its device-global columnState
spin-locks (alignSequenceGPU.cu:14-40, 470-484): here the dependency is
expressed structurally (device d runs chunk s-d at superstep s) and the
halo exchange is an XLA collective (``ppermute`` over ICI).

Two engines:

* :func:`sequence_parallel_checkpointed_fill` — the production path.
  Device d owns wavefront strip d (``rps*slots`` pattern rows) and runs
  the SAME deep-strip wavefront kernel the single-chip checkpoint
  engine uses (140+ GCUPS with dirs), over text chunks of ``ckpt_cols``
  columns: each chunk's in-kernel column checkpoint doubles as the next
  chunk's left boundary (wavefront.make_left_input), the strip's
  bottom-row stream (H, and F for affine) ppermutes to the next device,
  and the collected checkpoints form a standard
  :class:`ops.checkpoint.CheckpointedFill` — so the existing
  single-chip path-tile traceback runs unchanged and alignments stay
  byte-identical across all modes, affine included.
* :func:`sequence_parallel_fill` — the round-1 column-strip engine over
  the (slower) strip kernel, kept for the packed-words streaming path
  and its tests.

After the pipeline drains, per-strip best-cell states merge on host
with exact row-major first-occurrence semantics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import config
from ..ops import pallas_fill, wavefront
from ..ops.checkpoint import (
    DEFAULT_CKPT_COLS,
    CheckpointedFill,
    _pick_geometry,
)
from ..ops.pallas_fill import NEG_INF, ROWS_PER_STEP, SUBLANES
from . import mesh as mesh_lib

_INT = jnp.int32

# Jitted shard_map pipelines, keyed by (mesh devices + static config).
# Grows like any jit cache; entries are small (compiled executables are
# owned by the runtime).
_PIPE_FNS: dict = {}


# Measured per-chunk fixed overhead of the REAL pipeline vs this
# model, in wavefront steps (scripts/measure_seqpar_gate.py on the v5e,
# bench/results/r4_seqpar_gate.out): -3659 / -1735 / -6437 steps/chunk
# at ckpt_cols = 8k/16k/32k — i.e. the (ckpt_cols + slots) term OVER-
# estimates the measured chunk cost; the skew-ramp re-pay is mostly
# hidden.  Clamped to 0 (not the measured negative values) so the gate
# keeps margin for the un-modeled multi-device ppermute cost (a
# ckpt_cols-word int32 halo over ICI, micro-seconds vs ms-scale
# chunks).  Net: the model is a measured upper bound on pipeline cost,
# so the >=1.2 routing threshold errs toward the single chip.
PIPE_CHUNK_OVERHEAD_STEPS = 0


def estimated_speedup(n: int, m: int, d_count: int,
                      ckpt_cols: int = DEFAULT_CKPT_COLS) -> float:
    """Critical-path model of the pipelined chunked fill vs the
    single-chip strip loop (both ride the same wavefront kernel, so
    step counts compare directly): single chip sweeps every strip over
    the whole text; the pipeline's critical path is
    (num_chunks + num_strips - 1) chunk fills of (ckpt_cols + slots)
    steps, each chunk re-paying the skew ramp.  Returns 0 when the
    pattern needs more strips than devices (not supported).

    Calibrated on hardware round 4: the per-chunk term is a measured
    upper bound (see PIPE_CHUNK_OVERHEAD_STEPS above)."""
    rps, slots = _pick_geometry(m, None, None)
    rows = rps * slots
    num_strips = max(1, -(-m // rows))
    if num_strips > d_count:
        return 0.0
    num_chunks = max(1, -(-n // ckpt_cols))
    single = num_strips * (n + slots)
    par = (num_chunks + num_strips - 1) * (
        ckpt_cols + slots + PIPE_CHUNK_OVERHEAD_STEPS
    )
    return single / par


def sequence_parallel_checkpointed_fill(
        text, pattern, score_matrix, k_alpha: int, gap: int,
        local: bool = False, semi: bool = False,
        gap_extend: int | None = None,
        ckpt_cols: int = DEFAULT_CKPT_COLS,
        rps: int | None = None, slots: int | None = None,
        mesh: Optional[Mesh] = None) -> CheckpointedFill:
    """Phase-1 checkpoint fill of one long pair, pipelined over the mesh.

    Returns the same :class:`CheckpointedFill` the single-chip
    ``checkpointed_fill`` produces (same boundary layouts, same score /
    best-cell semantics), with the O(n*m) fill work split across
    devices; feed it to ``checkpointed_traceback`` for the exact
    alignment.
    """
    mesh = mesh if mesh is not None else mesh_lib.make_data_mesh()
    d_count = mesh.size
    axis = mesh_lib.DATA_AXIS
    interpret = config.pallas_interpret()

    text_np = np.asarray(text, dtype=np.int32)
    pattern_np = np.asarray(pattern, dtype=np.int32)
    sm = np.asarray(score_matrix, dtype=np.int32).reshape(-1)[
        : k_alpha * k_alpha
    ].reshape(k_alpha, k_alpha)
    pallas_fill.pack_score_matrix(sm, k_alpha)
    n, m = text_np.shape[0], pattern_np.shape[0]
    gap = int(gap)
    affine = gap_extend is not None
    ext = int(gap_extend) if affine else 0
    rps, slots = _pick_geometry(m, rps, slots)
    rows = rps * slots
    srows = slots // 128
    num_strips = max(1, -(-m // rows))
    assert num_strips <= d_count, (
        "pattern needs more wavefront strips than devices; use the "
        "single-chip checkpoint engine"
    )
    num_chunks = max(1, -(-n // ckpt_cols))
    tile_blocks = -(-(ckpt_cols + slots - 1) // wavefront.STEPS)
    tile_steps = tile_blocks * wavefront.STEPS
    # Device d works chunk c = s - d; devices beyond num_strips hold
    # padding strips whose outputs are discarded, so the pipeline only
    # needs the last REAL strip (d = num_strips - 1) to reach the last
    # chunk — matching estimated_speedup's critical-path model.
    supersteps = num_chunks + num_strips - 1
    snap_chunk = max(0, (n - 1) // ckpt_cols)

    l_pad = (num_chunks - 1) * ckpt_cols + tile_steps
    text_pad = np.zeros(l_pad, dtype=np.int32)
    text_pad[:n] = text_np

    # Per-device pattern strips in slot layout.
    pat_pad = np.zeros(d_count * rows, dtype=np.int32)
    pat_pad[:m] = pattern_np
    pats = np.ascontiguousarray(
        pat_pad.reshape(d_count, slots, rps).transpose(0, 2, 1)
    ).reshape(d_count, rps, srows, 128)

    perm = [(i, i + 1) for i in range(d_count - 1)]
    neg_half = wavefront.NEG_HALF

    def worker(pat_d, text_all, sm_dev):
        pat_d = pat_d[0]
        d = jax.lax.axis_index(axis)
        i0 = d * rows
        rvec = jnp.arange(rows + 1, dtype=_INT)
        tvec = jnp.arange(tile_steps, dtype=_INT)

        # Arithmetic left boundary lc[ri] = S[i0 + ri, 0] for chunk 0.
        if local:
            lc0 = jnp.zeros((rows + 1,), _INT)
        elif affine:
            lc0 = jnp.where(
                i0 + rvec == 0, 0, -(gap + ext * (i0 + rvec - 1))
            )
        else:
            lc0 = -(gap * (i0 + rvec))
        le0 = jnp.full((rows + 1,), neg_half, _INT)

        def superstep(carry, s):
            (halo, halo_f, left_col, left_e_col, acc, aj, snap,
             bounds_buf, fbounds_buf, colvals_buf, colvalse_buf) = carry
            c = s - d
            active = jnp.logical_and(c >= 0, c < num_chunks)
            c_c = jnp.clip(c, 0, num_chunks - 1)
            col_lo = c_c * ckpt_cols

            ts = jax.lax.dynamic_slice(text_all, (col_lo,), (tile_steps,))
            # Top boundary row of this strip for the chunk: strip 0 uses
            # the arithmetic row-0 boundary; others the received halo
            # (only the first ckpt_cols entries are real — cells beyond
            # column col_lo + ckpt_cols live in the skew drain and feed
            # nothing that is kept).
            if local or semi:
                arith_bot = jnp.zeros((tile_steps,), _INT)
            elif affine:
                arith_bot = -(gap + ext * (col_lo + tvec))
            else:
                arith_bot = -(gap * (col_lo + tvec + 1))
            halo_pad = jnp.concatenate(
                [halo, jnp.zeros((tile_steps - ckpt_cols,), _INT)]
            )
            bot = jnp.where(d == 0, arith_bot, halo_pad)
            if affine:
                fhalo_pad = jnp.concatenate(
                    [halo_f,
                     jnp.full((tile_steps - ckpt_cols,), neg_half, _INT)]
                )
                fbot = jnp.where(
                    d == 0,
                    jnp.full((tile_steps,), neg_half, _INT),
                    fhalo_pad,
                )
            else:
                fbot = None

            lc = jnp.where(c_c == 0, lc0, left_col)
            left_in = wavefront.make_left_input(lc, rps, slots)
            if affine:
                le = jnp.where(c_c == 0, le0, left_e_col)
                left_e = wavefront.make_left_input(le, rps, slots)
            else:
                left_e = None

            # Tracking is confined to this chunk's OWN columns
            # [col_lo+1, col_lo+ckpt_cols]; the drain region re-fills
            # the next chunk's ramp but is never tracked or kept.
            n_eff = jnp.clip(n - col_lo, 0, ckpt_cols)
            outs = wavefront.wavefront_strip(
                ts.reshape(tile_blocks, wavefront.STEPS),
                bot.reshape(tile_blocks, wavefront.STEPS),
                pat_d, sm_dev, gap, n_eff, m, i0,
                k_alpha=k_alpha, local=local, with_dirs=False,
                rps=rps, ckpt_every=ckpt_cols, slots=slots, semi=semi,
                left_in=left_in, affine=affine, ext=ext,
                fbot_in=(
                    fbot.reshape(tile_blocks, wavefront.STEPS)
                    if affine else None
                ),
                left_e=left_e, interpret=interpret,
            )
            _, bot_out, rowmax, argj, snap_o, ckpts = outs[:6]
            if affine:
                _, fbot_out, ckpts_e = outs[6:]

            # Bottom-row stream for columns col_lo+1..col_lo+ckpt_cols.
            seg = jax.lax.dynamic_slice(
                bot_out.reshape(-1), (slots - 1,), (ckpt_cols,)
            )
            bounds_buf = jnp.where(
                active,
                jax.lax.dynamic_update_slice(bounds_buf, seg, (col_lo,)),
                bounds_buf,
            )
            colvals_buf = jnp.where(
                active,
                jax.lax.dynamic_update_slice(
                    colvals_buf, ckpts[None], (c_c, 0, 0, 0)
                ),
                colvals_buf,
            )
            if affine:
                fseg = jax.lax.dynamic_slice(
                    fbot_out.reshape(-1), (slots - 1,), (ckpt_cols,)
                )
                fbounds_buf = jnp.where(
                    active,
                    jax.lax.dynamic_update_slice(
                        fbounds_buf, fseg, (col_lo,)
                    ),
                    fbounds_buf,
                )
                colvalse_buf = jnp.where(
                    active,
                    jax.lax.dynamic_update_slice(
                        colvalse_buf, ckpts_e[None], (c_c, 0, 0, 0)
                    ),
                    colvalse_buf,
                )
            else:
                fseg = seg

            # Best-cell trackers: per-row (max, first absolute column);
            # chunks own disjoint ascending column ranges, so strict
            # improvement keeps exact first-occurrence semantics.
            improved = jnp.logical_and(active, rowmax > acc)
            acc = jnp.where(improved, rowmax, acc)
            aj = jnp.where(improved, argj + col_lo, aj)
            snap = jnp.where(
                jnp.logical_and(active, c_c == snap_chunk), snap_o, snap
            )

            # This chunk's right boundary column becomes the next
            # chunk's left boundary; its corner S[i0, col_lo+ckpt_cols]
            # is the last real entry of this chunk's TOP boundary.
            col_rows = (
                ckpts.reshape(rps, slots).T.reshape(rows)
            )
            corner = jax.lax.dynamic_slice(bot, (ckpt_cols - 1,), (1,))
            new_left = jnp.concatenate([corner, col_rows])
            left_col = jnp.where(active, new_left, left_col)
            if affine:
                cole_rows = ckpts_e.reshape(rps, slots).T.reshape(rows)
                new_left_e = jnp.concatenate(
                    [jnp.full((1,), neg_half, _INT), cole_rows]
                )
                left_e_col = jnp.where(active, new_left_e, left_e_col)

            halo = jax.lax.ppermute(seg, axis, perm)
            if affine:
                halo_f = jax.lax.ppermute(fseg, axis, perm)
            return (
                (halo, halo_f, left_col, left_e_col, acc, aj, snap,
                 bounds_buf, fbounds_buf, colvals_buf, colvalse_buf),
                None,
            )

        z_seg = jnp.zeros((ckpt_cols,), _INT)
        carry0 = (
            z_seg, z_seg, jnp.zeros((rows + 1,), _INT),
            jnp.full((rows + 1,), neg_half, _INT),
            jnp.full((rps, srows, 128), NEG_INF, _INT),
            jnp.zeros((rps, srows, 128), _INT),
            jnp.full((srows, 128), NEG_INF, _INT),
            jnp.zeros((num_chunks * ckpt_cols,), _INT),
            jnp.zeros(
                ((num_chunks * ckpt_cols) if affine else 1,), _INT
            ),
            jnp.zeros((num_chunks, rps, srows, 128), _INT),
            jnp.zeros(
                (num_chunks if affine else 1, rps, srows, 128), _INT
            ),
        )
        carry, _ = jax.lax.scan(
            superstep, carry0, jnp.arange(supersteps, dtype=_INT)
        )
        (_, _, _, _, acc, aj, snap, bounds_buf, fbounds_buf,
         colvals_buf, colvalse_buf) = carry
        # Replicate the boundary buffers (one all-gather over ICI, a few
        # MB per 100k rows) so the single-chip traceback can slice
        # per-strip without cross-device gathers.
        return (
            acc[None], aj[None], snap[None],
            jax.lax.all_gather(bounds_buf, axis),
            jax.lax.all_gather(fbounds_buf, axis),
            jax.lax.all_gather(colvals_buf, axis),
            jax.lax.all_gather(colvalse_buf, axis),
        )

    spec = P(axis)
    # One jitted executable per static pipeline config, cached across
    # calls (and across different texts/matrices of the same shape —
    # they are ARGUMENTS, not trace constants).  Without this, every
    # call rebuilt the shard_map closure and paid a full retrace +
    # executable fetch (~21 s/call through the remote compile helper,
    # measured in bench/results/r4_seqpar_gate.out pre-fix).
    key = (
        tuple(int(dev.id) for dev in mesh.devices.flat), n, m, k_alpha,
        gap, ext, local, semi, affine, ckpt_cols, rps, slots, interpret,
    )
    fn = _PIPE_FNS.get(key)
    if fn is None:
        fn = jax.jit(jax.shard_map(
            worker, mesh=mesh, in_specs=(spec, P(), P()),
            out_specs=(spec, spec, spec, P(), P(), P(), P()),
            check_vma=False,
        ))
        _PIPE_FNS[key] = fn
    accs, ajs_d, snaps, bounds_d, fbounds_d, colvals_d, colvalse_d = fn(
        jnp.asarray(pats), jnp.asarray(text_pad), jnp.asarray(sm)
    )

    # Phase 2 (path-tile traceback) runs single-chip: land each strip's
    # boundary arrays on device 0 as plain single-device arrays, which
    # also strips the mesh's Explicit axis typing off their avals (the
    # downstream jit mixes them with unsharded values).
    dev0 = mesh.devices.flat[0]

    def ckpts_to_cols(x):
        # (num_chunks, rps, srows, 128) -> (num_chunks, rows).
        return (
            x.reshape(num_chunks, rps, slots)
            .transpose(0, 2, 1)
            .reshape(num_chunks, rows)
        )

    colvals = [
        jax.device_put(ckpts_to_cols(colvals_d[b]), dev0)
        for b in range(num_strips)
    ]
    boundaries = [
        jax.device_put(bounds_d[b], dev0) for b in range(num_strips)
    ]
    extra = {}
    if affine:
        extra = dict(
            gap_extend=ext,
            colvals_e=[
                jax.device_put(ckpts_to_cols(colvalse_d[b]), dev0)
                for b in range(num_strips)
            ],
            boundaries_f=[
                jax.device_put(fbounds_d[b], dev0)
                for b in range(num_strips)
            ],
        )

    accs, ajs_d, snaps = jax.device_get((accs, ajs_d, snaps))
    rowmaxs = [
        np.asarray(accs[b]).reshape(rps, -1) for b in range(num_strips)
    ]
    argjs = [
        np.asarray(ajs_d[b]).reshape(rps, -1) for b in range(num_strips)
    ]
    if local:
        score, bi, bj = wavefront.merge_local_best(
            rowmaxs, argjs, rows, rps, m, slots=slots
        )
    elif semi:
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


def _merge_states(states: np.ndarray, local: bool, n: int, m: int):
    """Merge per-strip [best, bi, bj, score] rows (ops/tiled.py semantics)."""
    if local:
        best, bi, bj = 0, 0, 0
        for s_best, s_bi, s_bj, _ in states:
            s_best, s_bi, s_bj = int(s_best), int(s_bi), int(s_bj)
            if s_best > best or (
                s_best == best and s_best > 0 and (s_bi, s_bj) < (bi, bj)
            ):
                best, bi, bj = s_best, s_bi, s_bj
        return best, bi, bj
    return max(int(s[3]) for s in states), m, n


def sequence_parallel_fill(text, pattern, score_matrix, k_alpha: int,
                           gap: int, local: bool = False,
                           with_dirs: bool = False,
                           mesh: Optional[Mesh] = None,
                           block_rows: int = ROWS_PER_STEP):
    """Fill one pair's DP matrix across all devices of the mesh.

    Returns (score, best_i, best_j, words) — words is the packed
    direction matrix (host numpy, (m_pad/16, num_devices*strip_cols)) when
    with_dirs, else None.
    """
    mesh = mesh if mesh is not None else mesh_lib.make_data_mesh()
    d_count = mesh.size
    axis = mesh_lib.DATA_AXIS
    interpret = config.pallas_interpret()

    text_np = np.asarray(text, dtype=np.int32)
    pattern_np = np.asarray(pattern, dtype=np.int32)
    sm = np.asarray(score_matrix, dtype=np.int32).reshape(-1)[
        : k_alpha * k_alpha
    ].reshape(k_alpha, k_alpha)
    n, m = text_np.shape[0], pattern_np.shape[0]
    gap = int(gap)

    # Strip sizing: whole padded width split evenly, each strip a
    # multiple of 1024 columns (8 x 128-lane segments).
    quantum = 1024 * d_count
    total_p = max(quantum, ((n + quantum - 1) // quantum) * quantum)
    strip_p = total_p // d_count
    l = strip_p // SUBLANES

    r = max(ROWS_PER_STEP,
            (block_rows // ROWS_PER_STEP) * ROWS_PER_STEP)
    m_pad = max(r, ((m + r - 1) // r) * r)
    t_blocks = m_pad // r
    supersteps = t_blocks + d_count - 1

    # Per-device strip profiles, stacked for sharding.
    profs = np.empty((d_count, k_alpha, SUBLANES, l), dtype=np.int32)
    for d in range(d_count):
        chunk = text_np[d * strip_p : (d + 1) * strip_p]
        prof = sm[:, chunk]
        pad = strip_p - chunk.shape[0]
        if pad:
            prof = np.pad(
                prof, ((0, 0), (0, pad)),
                constant_values=pallas_fill.PAD_SCORE,
            )
        profs[d] = prof.reshape(k_alpha, SUBLANES, l)

    pat_pad = np.zeros(m_pad, dtype=np.int32)
    pat_pad[:m] = pattern_np
    # Strip-0 boundary column S[i, 0] per row block (precomputed windows).
    lc0 = pallas_fill.nw_boundary_col(0, m_pad, gap, local)

    prev0 = np.stack(
        [
            pallas_fill.init_prev_row(l, d * strip_p, gap, local)
            for d in range(d_count)
        ]
    )
    # Top boundary entry of each strip: S[0, d*strip_p].
    top0 = np.asarray(
        [0 if local else -gap * (d * strip_p) for d in range(d_count)],
        dtype=np.int32,
    )

    perm = [(i, i + 1) for i in range(d_count - 1)]

    wpb = r // pallas_fill.DIR_ROWS_PER_WORD

    def worker(prof_d, prev_d, top_d):
        prof_d = prof_d[0]
        d = jax.lax.axis_index(axis)
        strip_off = d * strip_p
        pattern_all = jnp.asarray(pat_pad)
        lc0_all = jnp.asarray(lc0)
        state0 = jnp.asarray(pallas_fill._zeros_state(local))
        # Exactly the strip's own direction words (t_blocks row blocks);
        # inactive ramp-up/down supersteps write nothing, so the buffer
        # is O(m_pad * strip_p) with no superstep padding.
        dirs0 = (
            jnp.zeros((t_blocks, wpb, SUBLANES, l), _INT)
            if with_dirs
            else jnp.zeros((1, 1, 1, 1), _INT)
        )

        def superstep(carry, s):
            prev_row, state, lc_block, lc_top, dirs_buf = carry
            t = s - d
            active = jnp.logical_and(t >= 0, t < t_blocks)
            t_c = jnp.clip(t, 0, t_blocks - 1)
            row_base = t_c * r
            pat_blk = jax.lax.dynamic_slice(pattern_all, (row_base,), (r,))
            # Left boundary: strip 0 computes its own; others use the
            # halo received from the left neighbor.
            lc0_blk = jax.lax.dynamic_slice(lc0_all, (row_base,), (r + 1,))
            lc_halo = jnp.concatenate([lc_top[None], lc_block])
            lc_use = jnp.where(d == 0, lc0_blk, lc_halo)

            dirs, prev_out, rcol, state_out = pallas_fill.strip_fill_pallas(
                prof_d, pat_blk, gap, n, m, row_base, strip_off,
                lc_use, prev_row, state,
                local=local, with_dirs=with_dirs, interpret=interpret,
            )
            prev_row = jnp.where(active, prev_out, prev_row)
            state = jnp.where(active, state_out, state)
            new_top = jnp.where(active, lc_block[r - 1], lc_top)
            if with_dirs:
                dirs_buf = jax.lax.cond(
                    active,
                    lambda b: jax.lax.dynamic_update_slice(
                        b, dirs[None], (t_c, 0, 0, 0)
                    ),
                    lambda b: b,
                    dirs_buf,
                )
            # Halo exchange: my right boundary becomes the right
            # neighbor's left boundary at the next superstep.
            send = jnp.where(active, rcol, jnp.full((r,), NEG_INF, _INT))
            lc_next = jax.lax.ppermute(send, axis, perm)
            return (prev_row, state, lc_next, new_top, dirs_buf), None

        lc_init = jnp.full((r,), NEG_INF, _INT)
        (prev_row, state, _, _, dirs_buf), _ = jax.lax.scan(
            superstep,
            (prev_d[0], state0, lc_init, top_d[0].reshape(()), dirs0),
            jnp.arange(supersteps, dtype=_INT),
        )
        if with_dirs:
            return state[None], dirs_buf[None]
        return state[None]

    spec = P(axis)
    fn = jax.shard_map(
        worker,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(spec, spec) if with_dirs else spec,
        check_vma=False,
    )
    out = fn(
        jnp.asarray(profs), jnp.asarray(prev0), jnp.asarray(top0)
    )
    if with_dirs:
        states, dirs_all = out
    else:
        states = out
    states = np.asarray(jax.device_get(states)).reshape(-1, 4)
    score_or_best, bi, bj = _merge_states(states, local, n, m)

    words = None
    if with_dirs:
        dirs_np = np.asarray(jax.device_get(dirs_all))
        # dirs_np: (D, t_blocks, r/16, 8, l) — device d's strip, in row
        # block order (the inactive-superstep padding never existed).
        words = np.empty(
            (m_pad // pallas_fill.DIR_ROWS_PER_WORD, total_p), np.int32
        )
        for d in range(d_count):
            for t in range(t_blocks):
                blk = dirs_np[d, t].reshape(wpb, strip_p)
                words[t * wpb : (t + 1) * wpb,
                      d * strip_p : (d + 1) * strip_p] = blk
    return score_or_best, bi, bj, words
