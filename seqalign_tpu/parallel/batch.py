"""Data-parallel batched alignment over a device mesh.

Shards a padded pair batch over the mesh's ``data`` axis with
``jax.shard_map`` (score matrix replicated), the TPU-native equivalent of
scaling alignment throughput across workers.  Each device runs the
single-chip vmapped row-scan fill on its local shard; results gather
back along the same sharding.
"""

from __future__ import annotations

import dataclasses
from concurrent.futures import ThreadPoolExecutor
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import config
from ..ops import pallas_fill, scan_engine
from ..ops.batch import batch_score
from . import mesh as mesh_lib


# Jitted shard_map callables, keyed by mesh + trace-affecting config.
# Without these caches every call rebuilt its shard_map closure and
# re-traced/re-fetched the executable (a fixed multi-second cost per
# call through the remote compile helper; see r4_seqpar_gate.out).
_SCORE_FNS: dict = {}


def pack_letters_host(arr: np.ndarray) -> np.ndarray:
    """Pack 2-bit letters four-per-byte for the host->device upload
    (k_alpha <= 4 alphabets only — letters must be 0..3).  The upload is
    the largest single transfer of the batch path and the tunnel runs at
    ~15 MB/s, so 2 bits/letter instead of 8 is a direct wall-clock cut
    (measured in bench/results/r5_batch_e2e_profile.out).  Columns pad
    to a multiple of 4 with letter 0; :func:`unpack_letters_device`
    slices them back off."""
    b, n = arr.shape
    a = arr.astype(np.uint8)
    pad = (-n) % 4
    if pad:
        a = np.concatenate([a, np.zeros((b, pad), np.uint8)], axis=1)
    return (
        a[:, 0::4]
        | (a[:, 1::4] << 2)
        | (a[:, 2::4] << 4)
        | (a[:, 3::4] << 6)
    )


def unpack_letters_device(x, n_cols: int):
    """Inverse of :func:`pack_letters_host`, on device, int32 letters
    out.  One XLA unpack into an HBM temp per dispatch — noise next to
    the fill, and the Pallas kernels see the exact same int32 letter
    arrays as before (their AOT cache keys don't change)."""
    x = x.astype(jnp.int32)
    parts = [(x >> s) & 3 for s in (0, 2, 4, 6)]
    out = jnp.stack(parts, axis=2).reshape(x.shape[0], -1)
    return out[:, :n_cols]


def sharded_batch_score(mesh: Mesh, texts, patterns, ns, ms, score_matrix,
                        gap, local: bool = False, semi: bool = False,
                        gap_extend=None, uniform: bool = False,
                        packed_cols=None):
    """Scores for a batch sharded along the mesh ``data`` axis.

    The batch dimension must be divisible by the mesh size (use
    :func:`pad_batch` first).  uniform: every real pair's lengths equal
    the padded shapes exactly (callers must check against HOST lengths
    — see batch_score_pallas); drops the kernel's per-cell masking.
    packed_cols: (n_cols, m_cols) when texts/patterns arrive 2-bit
    packed via :func:`pack_letters_host` (DNA transfer cut); None for
    plain int8/int32 letter arrays.
    """
    spec = P(mesh_lib.DATA_AXIS)
    rep = P()
    use_pallas = config.use_pallas()

    # int16 cell mode: two DP cells per 32-bit VPU lane when every value
    # of the padded bucket provably fits (needs concrete matrix/gap —
    # traced callers stay on int32).
    n_cols = packed_cols[0] if packed_cols else texts.shape[1]
    m_cols = packed_cols[1] if packed_cols else patterns.shape[1]
    cell16 = False
    mode = config.int16_cells()
    if use_pallas and mode != "0":
        try:
            cell16 = pallas_fill.int16_cells_ok(
                n_cols, m_cols, score_matrix,
                score_matrix.shape[0], gap, gap_extend,
            )
        except Exception:
            cell16 = False
        if mode == "1" and not cell16:
            raise ValueError(
                "SEQALIGN_INT16_CELLS=1 but the padded shapes/scores "
                "exceed the int16 value cap (int16_cells_ok is False)"
            )

    def local_shard(t, p, n, m, sm):
        # The inter-pair kernel needs 128-multiple shards (use pad_batch
        # / BatchAligner for that); smaller shards fall back to the
        # vmapped XLA engine instead of failing.
        # Letters may arrive 2-bit packed (DNA) or as int8 (BatchAligner
        # ships them narrow to cut the host->device transfer); the
        # engines compute in int32.
        if packed_cols is not None:
            t = unpack_letters_device(t, n_cols)
            p = unpack_letters_device(p, m_cols)
        else:
            t = t.astype(jnp.int32)
            p = p.astype(jnp.int32)
        if use_pallas and t.shape[0] % 128 == 0:
            return pallas_fill.batch_score_pallas(
                t, p, n, m, sm, gap,
                k_alpha=sm.shape[0], local=local, semi=semi,
                gap_extend=gap_extend, cell16=cell16, uniform=uniform,
                interpret=config.pallas_interpret(),
            )
        return batch_score(
            t, p, n, m, sm, gap, local=local, semi=semi,
            gap_extend=gap_extend
        )

    # check_vma=False: the scan carry inits are device-invariant while the
    # scanned inputs vary over 'data'; the values are correct either way.
    key = (
        tuple(int(d.id) for d in mesh.devices.flat), use_pallas, cell16,
        local, semi, int(gap),
        int(gap_extend) if gap_extend is not None else None,
        uniform, packed_cols, config.pallas_interpret(),
    )
    fn = _SCORE_FNS.get(key)
    if fn is None:
        fn = jax.jit(jax.shard_map(
            local_shard,
            mesh=mesh,
            in_specs=(spec, spec, spec, spec, rep),
            out_specs=spec,
            check_vma=False,
        ))
        _SCORE_FNS[key] = fn
    return fn(texts, patterns, ns, ms, score_matrix)


# Flat-index budget of one batched-walker call (int32 gather space);
# tests shrink it to force multi-group walks.
WALK_INDEX_CAP = (1 << 31) - 1

# HBM budget for one fill+walk dispatch's direction words (per device);
# buckets of big pairs are processed in sub-batches under it.
DIRS_HBM_BUDGET = 2 << 30


@dataclasses.dataclass
class _Bucket:
    indices: list
    n_pad: int
    m_pad: int


def _host_shards(arr, axis: int, size: int):
    """Assemble this process's addressable shards of a global array into
    a host array of full extent ``size`` along ``axis``, plus a boolean
    owned-mask over that axis (rows other processes hold stay zero)."""
    out = None
    owned = np.zeros(size, dtype=bool)
    for sh in arr.addressable_shards:
        data = np.asarray(sh.data)
        sl = sh.index[axis]
        start = sl.start or 0
        stop = start + data.shape[axis]
        if out is None:
            shape = list(data.shape)
            shape[axis] = size
            out = np.zeros(shape, data.dtype)
        sel = [slice(None)] * data.ndim
        sel[axis] = slice(start, stop)
        out[tuple(sel)] = data
        owned[start:stop] = True
    if out is None:  # no addressable shards (shouldn't happen)
        out = np.zeros([size], arr.dtype)
    return out, owned


def _prefetch_host(outs) -> None:
    """Best-effort async device->host copy for a dispatched bucket's
    outputs, so the transfer starts the moment the fill+walk finishes
    instead of when collection reaches the chunk.  Purely an overlap
    hint: backends/arrays that can't (no method, non-addressable
    shards) just download synchronously at collect time."""
    for arr in outs:
        try:
            arr.copy_to_host_async()
        except Exception:
            return


class BatchAligner:
    """Length-bucketed many-pair scorer.

    Groups pairs into (padded text width, padded pattern rows) buckets,
    pads each bucket to a device-divisible batch, and runs the sharded
    score fill per bucket.  This is the capability the reference only
    measured sequentially (tests/benchmarks.cu:271-332), made real.
    """

    def __init__(self, score_matrix: np.ndarray, alphabet_size: int,
                 gap_penalty: int, local: bool = False,
                 semi: bool = False,
                 gap_extend: Optional[int] = None,
                 mesh: Optional[Mesh] = None):
        # gap_extend: affine (Gotoh) gap costs — a run of length L costs
        # gap_penalty + (L-1)*gap_extend; requires gap_penalty >=
        # gap_extend.  None = the reference's linear model.
        # semi: semi-global ("fit") scoring — mutually exclusive with
        # local; composes with gap_extend (affine fit, oracle algo=2).
        config.enable_compile_cache()
        if gap_extend is not None and gap_penalty < gap_extend:
            raise ValueError("affine gaps require gap_penalty >= gap_extend")
        if semi and local:
            raise ValueError("semi is exclusive with local")
        sm = np.asarray(score_matrix, dtype=np.int32).reshape(-1)[
            : alphabet_size * alphabet_size
        ].reshape(alphabet_size, alphabet_size)
        if config.use_pallas():
            # The Pallas batch kernel packs scores into bytes; enforce its
            # |score| <= 127 contract here where the matrix is concrete.
            pallas_fill.pack_score_matrix(sm, alphabet_size)
        self.score_matrix = jnp.asarray(sm)
        self.gap_penalty = gap_penalty
        self.gap_extend = gap_extend
        self.local = local
        self.semi = semi
        self.mesh = mesh if mesh is not None else mesh_lib.make_data_mesh()
        self._fill_walk_fns: dict = {}

    def _buckets(self, texts: Sequence[np.ndarray],
                 patterns: Sequence[np.ndarray]) -> list[_Bucket]:
        """Group non-degenerate pairs by padded shape.  Pairs with an
        empty text or pattern are excluded — the device fills' masking
        assumes n, m >= 1 (e.g. the affine-semi last-row mask never
        fires at n == 0) — and are scored/aligned via the oracle by the
        callers instead."""
        groups: dict[tuple[int, int], list[int]] = {}
        for i, (t, p) in enumerate(zip(texts, patterns)):
            if len(t) == 0 or len(p) == 0:
                continue
            n_pad = scan_engine.padded_width(len(t)) - 1
            m_pad = scan_engine.padded_rows(len(p))
            groups.setdefault((n_pad, m_pad), []).append(i)
        return [
            _Bucket(indices=idx, n_pad=k[0], m_pad=k[1])
            for k, idx in sorted(groups.items())
        ]

    def _oracle_degenerate(self, out, results, texts, patterns):
        """Fill empty-sequence pairs from the native oracle (the
        source of truth for the score/alignment contract on ALL
        inputs, sa_fill / sa_fill_affine handle n == 0 / m == 0)."""
        from ..models.base import AlignmentResult
        from ..native import bindings

        algo = 2 if self.semi else (1 if self.local else 0)
        sm = np.asarray(self.score_matrix)
        k = sm.shape[0]
        for i, (t, p) in enumerate(zip(texts, patterns)):
            if len(t) != 0 and len(p) != 0:
                continue
            t8, p8 = t.astype(np.int8), p.astype(np.int8)
            if self.gap_extend is not None:
                if out is not None:
                    out[i], _ = bindings.oracle_fill_affine(
                        algo, t8, p8, sm, k, self.gap_penalty,
                        self.gap_extend,
                    )
                else:
                    at, ap, st, sp, score = bindings.oracle_align_affine(
                        algo, t8, p8, sm, k, self.gap_penalty,
                        self.gap_extend,
                    )
            else:
                if out is not None:
                    _, out[i], _ = bindings.oracle_fill(
                        algo, t8, p8, sm, k, self.gap_penalty
                    )
                else:
                    at, ap, st, sp, score = bindings.oracle_align(
                        algo, t8, p8, sm, k, self.gap_penalty
                    )
            if out is None:
                results[i] = AlignmentResult(
                    aligned_text=at, aligned_pattern=ap,
                    start_in_aligned_text=st,
                    start_in_aligned_pattern=sp, score=score,
                )

    def score(self, texts: Sequence[np.ndarray],
              patterns: Sequence[np.ndarray], *,
              swap: bool = True) -> np.ndarray:
        """Scores for all pairs; order preserved. By default, pairs
        where the pattern is longer than the text are swapped internally
        — for global/local the DP is symmetric up to that swap (the same
        swap the CLI performs); for semi-global the swap changes which
        sequence gets the free end-gaps, so semi batches always fit the
        *shorter* sequence into the longer one, matching the CLI's
        behavior on the same pair of files.  Pass swap=False to score
        pairs exactly as given — the orientation align() always uses —
        so mixed score()/align() callers see consistent results."""
        texts = [np.asarray(t, dtype=np.int32) for t in texts]
        patterns = [np.asarray(p, dtype=np.int32) for p in patterns]
        if swap:
            for i in range(len(texts)):
                if texts[i].shape[0] < patterns[i].shape[0]:
                    texts[i], patterns[i] = patterns[i], texts[i]

        out = np.zeros(len(texts), dtype=np.int32)
        self._oracle_degenerate(out, None, texts, patterns)
        # The inter-pair Pallas kernel wants 1024 pairs per device shard;
        # the XLA fallback only needs device divisibility.
        quantum = self.mesh.size * (
            pallas_fill.TILE_PAIRS if config.use_pallas() else 1
        )
        for bucket in self._buckets(texts, patterns):
            b = len(bucket.indices)
            b_pad = max(quantum, ((b + quantum - 1) // quantum) * quantum)
            t_arr = np.zeros((b_pad, bucket.n_pad), dtype=np.int8)
            p_arr = np.zeros((b_pad, bucket.m_pad), dtype=np.int8)
            ns = np.zeros(b_pad, dtype=np.int32)
            ms = np.zeros(b_pad, dtype=np.int32)
            for row, i in enumerate(bucket.indices):
                t, p = texts[i], patterns[i]
                t_arr[row, : t.shape[0]] = t
                p_arr[row, : p.shape[0]] = p
                ns[row], ms[row] = t.shape[0], p.shape[0]
            # Uniform bucket (every real pair exactly the padded shape,
            # e.g. fixed-length read batches): the kernel drops its
            # per-cell validity masking.  Checked on HOST lengths.
            uniform = bool(
                (ns[:b] == bucket.n_pad).all()
                and (ms[:b] == bucket.m_pad).all()
            )
            # DNA (k<=4): letters provably 0..3, so ship them 2-bit
            # packed — the upload is the batch path's largest transfer.
            packed_cols = None
            if self.score_matrix.shape[0] <= 4:
                packed_cols = (bucket.n_pad, bucket.m_pad)
                t_arr = pack_letters_host(t_arr)
                p_arr = pack_letters_host(p_arr)
            scores = sharded_batch_score(
                self.mesh,
                jnp.asarray(t_arr),
                jnp.asarray(p_arr),
                jnp.asarray(ns),
                jnp.asarray(ms),
                self.score_matrix,
                self.gap_penalty,
                local=self.local,
                semi=self.semi,
                gap_extend=self.gap_extend,
                uniform=uniform,
                packed_cols=packed_cols,
            )
            if jax.process_count() > 1:
                # Multi-process mesh: this process can only device_get
                # its own shards; all-gather the (4-byte/pair) scores so
                # every process returns the full result array.
                from jax.experimental import multihost_utils

                scores = np.asarray(
                    multihost_utils.process_allgather(scores, tiled=True)
                )
            else:
                scores = np.asarray(jax.device_get(scores))
            for row, i in enumerate(bucket.indices):
                out[i] = scores[row]
        return out

    @staticmethod
    def _dirs_tile_pairs(n_pad: int, m_pad: int, b: int,
                         d_count: int) -> int:
        """Pairs per grid step of the dirs-emitting kernel: as large as
        the ~3 (n_pad x tile_pairs) int32 VMEM buffers allow (measured:
        512 pairs at 8192^2 compiles and quadruples fill throughput over
        128 — the chain latency amortizes over more pairs), without
        padding a small batch far past its own size."""
        words_bytes = (m_pad // 16) * n_pad * 4
        t = 128
        # Bounds: ~3 (n_pad x t) int32 VMEM buffers; 4096-pair tiles
        # regress badly (measured 10x at 512^2 — VMEM pressure stalls
        # the pipeline); and a tile's direction words must fit the HBM
        # dispatch budget (16.8 MB/pair at 8192^2).
        while (
            t < 2048
            and 12 * n_pad * (t * 2) <= 80 * 1024 * 1024
            and words_bytes * (t * 2) <= DIRS_HBM_BUDGET
        ):
            t *= 2
        # Don't pad a small batch to a huge tile: cap near the per-shard
        # batch size (rounded up to the 128-slot quantum).
        per_shard = -(-b // d_count)
        cap = max(128, -(-per_shard // 128) * 128)
        return min(t, cap)

    def align(self, texts: Sequence[np.ndarray],
              patterns: Sequence[np.ndarray]) -> list:
        """Full alignments (score + traceback) for all pairs, end to end
        on device and data-parallel over the mesh: each device fills its
        pair shard with packed direction words and walks every pair in
        lockstep — only the packed move lists come back.  The reference
        can only loop requests one at a time
        (tests/benchmarks.cu:271-332).

        Unlike score()'s default, pairs are aligned exactly as given (no
        internal text/pattern swap — the tie policy is
        orientation-sensitive, so a swap would change the optimal
        alignment reported; callers wanting the CLI's longer-first
        convention should swap before the call, and callers mixing the
        two methods can pass score(..., swap=False) for matching
        orientation).  Returns a list of AlignmentResult (alphabet
        indices, gap == alphabet size), byte-identical to the CPU
        oracle.

        On a multi-process mesh each process returns results only for
        the pairs its own shard covers (others stay None) — move lists
        are too large to all-gather; score() by contrast all-gathers.
        """
        from ..models.base import AlignmentResult
        from ..native import bindings

        affine = self.gap_extend is not None
        texts = [np.asarray(t, dtype=np.int32) for t in texts]
        patterns = [np.asarray(p, dtype=np.int32) for p in patterns]
        use_pallas = config.use_pallas()
        interpret = config.pallas_interpret()
        if not use_pallas:
            # Portable fallback: the oracle engine per pair.
            k = self.score_matrix.shape[0]
            algo = 2 if self.semi else (1 if self.local else 0)
            out = []
            for t, p in zip(texts, patterns):
                if affine:
                    at, ap, st, sp, sc = bindings.oracle_align_affine(
                        algo, t.astype(np.int8), p.astype(np.int8),
                        np.asarray(self.score_matrix), k,
                        self.gap_penalty, self.gap_extend,
                    )
                else:
                    at, ap, st, sp, sc = bindings.oracle_align(
                        algo, t.astype(np.int8), p.astype(np.int8),
                        np.asarray(self.score_matrix), k,
                        self.gap_penalty,
                    )
                out.append(AlignmentResult(at, ap, st, sp, sc))
            return out

        results: list = [None] * len(texts)
        self._oracle_degenerate(None, results, texts, patterns)
        # Bucket shapes quantize to multiples of 128 (score()'s
        # convention, scan_engine.padded_rows).  The kernels only need
        # 16-row granularity, but every distinct (n_pad, m_pad) is its
        # own Mosaic compile AND its own 128-pair-quantum dispatch: at
        # 16-granularity a 64-pair ragged workload (100-400nt) shatters
        # into ~60 single-pair buckets — hours of AOT compiles for
        # milliseconds of fill.  At 128 it collapses to <= a dozen
        # well-tested shapes; padding cells ride the already-padded
        # pair tile and are masked by ns/ms as usual.
        groups: dict[tuple[int, int], list[int]] = {}
        for i, (t, p) in enumerate(zip(texts, patterns)):
            if len(t) == 0 or len(p) == 0:
                continue
            n_pad = max(128, -(-len(t) // 128) * 128)
            m_pad = max(128, -(-len(p) // 128) * 128)
            groups.setdefault((n_pad, m_pad), []).append(i)

        k_alpha = self.score_matrix.shape[0]
        mesh = self.mesh
        d_count = mesh.size
        spec = P(mesh_lib.DATA_AXIS)
        rep = P()
        pending: list = []
        for (n_pad, m_pad), full_idx in sorted(groups.items()):
            tile_pairs = self._dirs_tile_pairs(
                n_pad, m_pad, len(full_idx), d_count
            )
            quantum = tile_pairs * d_count
            # One dispatch's direction words must fit HBM (16.8 MB/pair
            # at 8192^2): big-pair buckets run in sub-batches.
            words_bytes = (m_pad // 16) * n_pad * 4
            per_dev = max(
                tile_pairs,
                DIRS_HBM_BUDGET // words_bytes // tile_pairs * tile_pairs,
            )
            chunk = per_dev * d_count
            # Voluntary pipeline chunking: every chunk dispatches up
            # front (jax queues them; only small packed move lists
            # accumulate on device) and collection streams afterwards,
            # so the device fills later chunks while the host downloads
            # and native-emits earlier ones.
            pipe = config.batch_pipeline_pairs()
            if pipe:
                chunk = min(chunk, max(quantum, -(-pipe // quantum) * quantum))
            idx_chunks = [
                full_idx[c0 : c0 + chunk]
                for c0 in range(0, len(full_idx), chunk)
            ]
            for idx in idx_chunks:
                pending.append(self._dispatch_bucket(
                    idx, n_pad, m_pad, tile_pairs, quantum, texts,
                    patterns, affine, interpret, k_alpha,
                ))
        # Start every chunk's D2H transfer as soon as its fill+walk
        # finishes (the tunnel download is the largest host phase) so
        # transfers run behind the native emit of earlier chunks.
        for p in pending:
            _prefetch_host(p[5])
        # Downloads stay on this thread (jax calls); the pure-numpy/
        # ctypes emit runs one chunk behind on a worker thread — the
        # native walk releases the GIL and the download is network
        # I/O, so the two genuinely overlap even on one core.
        with ThreadPoolExecutor(max_workers=1) as ex:
            jobs = [
                ex.submit(self._emit_bucket, self._download_bucket(p),
                          results, affine, k_alpha)
                for p in pending
            ]
            for j in jobs:
                j.result()
        return results

    def _dispatch_bucket(self, idx, n_pad, m_pad, tile_pairs, quantum,
                         texts, patterns, affine, interpret, k_alpha):
        """Prep + fill + walk one HBM-sized sub-batch of a size bucket;
        returns the in-flight device outputs plus the host arrays
        :meth:`_collect_bucket` needs to emit them."""
        from ..ops.batch_traceback import (
            batch_device_traceback,
            batch_pallas_traceback,
            fits_batch_walker,
        )

        mesh = self.mesh
        d_count = mesh.size
        spec = P(mesh_lib.DATA_AXIS)
        rep = P()
        mode16 = config.int16_cells()
        cell16 = mode16 != "0" and pallas_fill.int16_cells_ok(
            n_pad, m_pad, np.asarray(self.score_matrix),
            k_alpha, self.gap_penalty, self.gap_extend,
        )
        if mode16 == "1" and not cell16:
            raise ValueError(
                "SEQALIGN_INT16_CELLS=1 but the padded shapes/scores "
                "exceed the int16 value cap (int16_cells_ok is False)"
            )
        b = len(idx)
        b_pad = max(quantum, -(-b // quantum) * quantum)
        # Letters ride to the device as int8 (alphabets are <= 23
        # symbols) and widen on device — a 4x cut of the dominant
        # host->device transfer; the emitters below consume the same
        # int8 matrices directly.
        t_arr = np.zeros((b_pad, n_pad), dtype=np.int8)
        p_arr = np.zeros((b_pad, m_pad), dtype=np.int8)
        ns = np.zeros(b_pad, dtype=np.int32)
        ms = np.zeros(b_pad, dtype=np.int32)
        for row, i in enumerate(idx):
            t, p = texts[i], patterns[i]
            t_arr[row, : t.shape[0]] = t
            p_arr[row, : p.shape[0]] = p
            ns[row], ms[row] = t.shape[0], p.shape[0]
        max_len = -(-(n_pad + m_pad) // 16) * 16
        # Uniform bucket: the fill drops its per-cell masking (host
        # lengths checked — see batch_score_pallas's contract).
        uniform = bool(
            (ns[:b] == n_pad).all() and (ms[:b] == m_pad).all()
        )

        # DNA (k<=4): ship the letters 2-bit packed (the emitters below
        # still consume the int8 matrices on host, so pack a copy).
        lpacked = k_alpha <= 4
        if lpacked:
            t_up = pack_letters_host(t_arr)
            p_up = pack_letters_host(p_arr)
        else:
            t_up, p_up = t_arr, p_arr

        def shard(t_s, p_s, ns_s, ms_s, sm):
            # Fill + lockstep walk of this device's pair shard.
            if lpacked:
                t_s = unpack_letters_device(t_s, n_pad)
                p_s = unpack_letters_device(p_s, m_pad)
            else:
                t_s = t_s.astype(jnp.int32)
                p_s = p_s.astype(jnp.int32)
            scores, bis, bjs, dirs, dirs2 = (
                pallas_fill.batch_fill_dirs_pallas(
                    t_s, p_s, ns_s, ms_s, sm, self.gap_penalty,
                    k_alpha=k_alpha, local=self.local,
                    semi=self.semi, tile_pairs=tile_pairs,
                    gap_extend=self.gap_extend, cell16=cell16,
                    uniform=uniform, interpret=interpret,
                )
            )
            if self.local:
                # No-match pairs (best <= 0): empty alignment with
                # the reference's cursor sentinels (maxIJ stays 0).
                matched = scores > 0
                bis = jnp.where(matched, bis, 0)
                bjs = jnp.where(matched, bjs, 0)
            # The walker's flat gather index is int32: walk in
            # chunks whose words stay under the index budget —
            # whole-tile groups normally, sub_rows slices of one
            # tile when even a single tile exceeds it (the pair
            # layout is slot-major, so a sub_rows slice is a
            # contiguous pair range).
            num_tiles, w_rows_, n_cols_, sub_rows_, _ = dirs.shape
            per_sub = w_rows_ * n_cols_ * 128
            per_tile = per_sub * sub_rows_
            parts = ([], [], [], [])

            def walk(d_slice, d2_slice, lo, hi):
                # Small slices of big pairs route to the per-pair
                # in-kernel walker (~0.2 us/move serialized over pairs);
                # large slices amortize the lockstep gather walk's
                # ~26 us/step across the whole batch.
                if 0 < hi - lo <= config.batch_walker_max_pairs() and (
                    fits_batch_walker(n_cols_, w_rows_, max_len, affine)
                ):
                    pk, ln, fi, fj = batch_pallas_traceback(
                        d_slice, ns_s[lo:hi], ms_s[lo:hi],
                        bis[lo:hi], bjs[lo:hi],
                        local=self.local, semi=self.semi,
                        max_len=max_len, dirs2=d2_slice,
                        interpret=interpret,
                    )
                else:
                    pk, ln, fi, fj = batch_device_traceback(
                        d_slice, ns_s[lo:hi], ms_s[lo:hi],
                        bis[lo:hi], bjs[lo:hi],
                        local=self.local, semi=self.semi,
                        max_len=max_len, dirs2=d2_slice,
                    )
                parts[0].append(pk)
                parts[1].append(ln)
                parts[2].append(fj)
                parts[3].append(fi)

            if per_tile <= WALK_INDEX_CAP:
                group = max(1, WALK_INDEX_CAP // per_tile)
                for g0 in range(0, num_tiles, group):
                    g1 = min(g0 + group, num_tiles)
                    walk(
                        dirs[g0:g1],
                        dirs2[g0:g1] if affine else None,
                        g0 * tile_pairs, g1 * tile_pairs,
                    )
            else:
                sub_chunk = max(1, WALK_INDEX_CAP // per_sub)
                for t in range(num_tiles):
                    for s0 in range(0, sub_rows_, sub_chunk):
                        s1 = min(s0 + sub_chunk, sub_rows_)
                        lo = t * tile_pairs + s0 * 128
                        walk(
                            dirs[t : t + 1, :, :, s0:s1],
                            dirs2[t : t + 1, :, :, s0:s1]
                            if affine else None,
                            lo, lo + (s1 - s0) * 128,
                        )
            return (
                scores, bis, bjs,
                jnp.concatenate(parts[0], axis=1),
                jnp.concatenate(parts[1]),
                jnp.concatenate(parts[2]),
                jnp.concatenate(parts[3]),
            )

        # Cache the jitted pipeline per trace-affecting config (the
        # instance pins mesh/mode/gaps; jit handles shape retraces).
        fw_key = (
            n_pad, m_pad, tile_pairs, cell16, k_alpha, max_len, uniform,
            lpacked, interpret, config.batch_walker_max_pairs(),
            WALK_INDEX_CAP,
        )
        fill_walk = self._fill_walk_fns.get(fw_key)
        if fill_walk is None:
            fill_walk = jax.jit(jax.shard_map(
                shard,
                mesh=mesh,
                in_specs=(spec, spec, spec, spec, rep),
                out_specs=(spec, spec, spec, P(None, mesh_lib.DATA_AXIS),
                           spec, spec, spec),
                check_vma=False,
            ))
            self._fill_walk_fns[fw_key] = fill_walk
        outs = fill_walk(
            jnp.asarray(t_up), jnp.asarray(p_up),
            jnp.asarray(ns), jnp.asarray(ms), self.score_matrix,
        )
        return (idx, t_arr, p_arr, ns, ms, outs)

    def _collect_bucket(self, pending, results, affine, k_alpha):
        """Download + native-emit one dispatched sub-batch (blocks on
        that dispatch only; later chunks keep filling on device)."""
        self._emit_bucket(
            self._download_bucket(pending), results, affine, k_alpha
        )

    def _download_bucket(self, pending):
        """Main-thread half of collection: device_get this sub-batch's
        outputs (blocks on that dispatch only; later chunks keep
        filling on device)."""
        idx, t_arr, p_arr, ns, ms, outs = pending
        scores, bis, bjs, packed, lens, j_fin, i_fin = outs
        if jax.process_count() > 1:
            # Multi-process mesh: only this process's pair shards are
            # addressable (the move lists are too big to all-gather);
            # emit results for owned rows, leave the rest None — the
            # standard SPMD contract, each process handles its shard.
            b_pad = len(ns)
            scores, owned = _host_shards(scores, 0, b_pad)
            packed, _ = _host_shards(packed, 1, b_pad)
            lens, _ = _host_shards(lens, 0, b_pad)
            j_fin, _ = _host_shards(j_fin, 0, b_pad)
            i_fin, _ = _host_shards(i_fin, 0, b_pad)
            bis_np, _ = _host_shards(bis, 0, b_pad)
            bjs_np, _ = _host_shards(bjs, 0, b_pad)
        else:
            owned = None
            (scores, packed, lens, j_fin, i_fin, bis_np,
             bjs_np) = jax.device_get(
                (scores, packed, lens, j_fin, i_fin, bis, bjs)
            )
        return (idx, t_arr, p_arr, ns, ms, owned, scores, packed, lens,
                j_fin, i_fin, bis_np, bjs_np)

    def _emit_bucket(self, host, results, affine, k_alpha):
        """Worker-thread half of collection: native-emit one downloaded
        sub-batch (numpy + GIL-releasing ctypes only — no jax calls, so
        it is safe off the main thread and overlaps later downloads)."""
        from ..models.base import AlignmentResult
        from ..native import bindings

        (idx, t_arr, p_arr, ns, ms, owned, scores, packed, lens,
         j_fin, i_fin, bis_np, bjs_np) = host
        packed = np.asarray(packed)
        # Replay the whole bucket's move lists through one native call
        # (same walk semantics as the per-pair emitters — mode 0/1
        # mirrors sa_emit_moves, mode 2 the affine numpy replay; the
        # per-pair ctypes loop cost ~106 us/pair and dominated the
        # end-to-end batch wall, see scripts/profile_batch_e2e.py).
        if self.local or self.semi:
            start_is, start_js = bis_np, bjs_np
        else:
            start_is, start_js = ms, ns
        mode = 2 if affine else (1 if self.local else 0)
        at_all, ap_all, st_all, sp_all = bindings.emit_moves_batch(
            packed.T, lens, start_is, start_js, mode,
            t_arr, p_arr, k_alpha,
        )
        # Python-level assembly is ~40% of the warm host wall at 64k
        # pairs: tolist() the scalar columns once (C loop) instead of
        # 5 numpy scalar reads per pair, and hand out views of the
        # emit buffers instead of per-pair copies (the buffers are
        # bucket-sized and immutable once emitted).
        lens_l = lens.tolist()
        scores_l = scores.tolist()
        if self.semi:
            st_l, sp_l = j_fin.tolist(), None
        else:
            st_l, sp_l = st_all.tolist(), sp_all.tolist()
        for row, i in enumerate(idx):
            if owned is not None and not owned[row]:
                continue
            ln = lens_l[row]
            results[i] = AlignmentResult(
                aligned_text=at_all[row, :ln],
                aligned_pattern=ap_all[row, :ln],
                start_in_aligned_text=st_l[row],
                start_in_aligned_pattern=0 if self.semi else sp_l[row],
                score=scores_l[row],
            )
        return results
