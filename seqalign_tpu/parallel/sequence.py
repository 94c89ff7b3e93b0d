"""Sequence-parallel single-pair alignment across a device mesh.

One long pair's DP matrix is split into column strips, one per device;
row blocks flow down each strip, and strip boundary columns are handed
to the right neighbor with ``ppermute`` over ICI — a pipelined diagonal
wavefront across devices.  This is the multi-chip analog of the
reference's chunked CUDA-stream pipeline with its device-global
columnState spin-locks (alignSequenceGPU.cu:14-40, 470-484): here the
dependency is expressed structurally (device d runs row block s-d at
superstep s) and the halo exchange is an XLA collective.

After the pipeline drains, each device holds its strip's local
best-cell state; states merge on host with exact row-major
first-occurrence semantics (as in ops/tiled.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import config
from ..ops import pallas_fill
from ..ops.pallas_fill import NEG_INF, ROWS_PER_STEP, SUBLANES
from . import mesh as mesh_lib

_INT = jnp.int32


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
