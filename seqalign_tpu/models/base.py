"""Shared pairwise-aligner machinery for the accelerator models."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..native import bindings
from ..ops import pallas_fill, scan_engine


@dataclasses.dataclass
class AlignmentResult:
    """Engine-level alignment result (alphabet indices, gap == K)."""

    aligned_text: np.ndarray
    aligned_pattern: np.ndarray
    start_in_aligned_text: int
    start_in_aligned_pattern: int
    score: int


class PairAligner:
    """Base: device DP fill + host traceback for one sequence pair.

    Two interchangeable fill engines produce bit-identical direction
    matrices: the Pallas kernel (packed 2-bit words) and the portable
    lax.scan engine (byte directions).  Engine choice: config.engine().
    """

    local: bool = False

    # -- shared preparation ------------------------------------------------

    @staticmethod
    def _score_matrix(score_matrix, alphabet_size: int) -> np.ndarray:
        return np.ascontiguousarray(
            np.asarray(score_matrix, dtype=np.int32).reshape(-1)[
                : alphabet_size * alphabet_size
            ].reshape(alphabet_size, alphabet_size)
        )

    # -- portable (lax.scan) engine -----------------------------------------

    def _prepare_xla(self, text, pattern, score_matrix, alphabet_size):
        n = int(np.asarray(text).shape[0])
        m = int(np.asarray(pattern).shape[0])
        width = scan_engine.padded_width(n)
        m_pad = scan_engine.padded_rows(m)
        sm = self._score_matrix(score_matrix, alphabet_size)
        profile = scan_engine.build_profile(
            jnp.asarray(np.asarray(text, dtype=np.int32)), jnp.asarray(sm), width
        )
        pattern_dev = jnp.asarray(
            scan_engine.pad_pattern(np.asarray(pattern, dtype=np.int32), m_pad)
        )
        return profile, pattern_dev, n, m

    # -- pallas engines ------------------------------------------------------

    def _align_wavefront(self, text, pattern, score_matrix, alphabet_size,
                         gap_penalty):
        """Default TPU path: skewed-wavefront fill + skewed traceback."""
        from ..ops import wavefront

        text = np.asarray(text, dtype=np.int32)
        pattern = np.asarray(pattern, dtype=np.int32)
        sm = self._score_matrix(score_matrix, alphabet_size)
        # Host-RAM guard for the streamed direction words (2 bits/cell
        # + pipeline skew); the reference's analog is initMemory's free-
        # VRAM arithmetic (alignSequenceGPU.cu:372-393).
        rows = wavefront.strip_rows()
        steps_est = text.shape[0] + wavefront.SLOTS
        words_bytes = (
            -(-pattern.shape[0] // rows)
            * (steps_est // 16 + 1) * wavefront.ROWS_PER_SLOT
            * wavefront.SLOTS * 4
        )
        if words_bytes > config.host_dirs_budget():
            # Too long for one streamed dispatch.  With a multi-device
            # mesh, split the pair's column strips across devices
            # (sequence parallelism, parallel/sequence.py) while the
            # words still fit host RAM; otherwise prefer the
            # one-dispatch direct path (fill + device best-cell merge +
            # in-kernel walk) and fall back to the checkpointed engine
            # (boundary checkpoints + path-only traceback re-fill,
            # ops/checkpoint.py) beyond its strip/SMEM limits.
            from ..ops import direct

            if config.sequence_parallel():
                import os

                from ..parallel.sequence import estimated_speedup

                # Route to the mesh only when the pipeline model says
                # it actually beats one chip (ramp re-pay + pipeline
                # bubble make small jobs slower); =1 in the env forces
                # it for tests and pods where the model is known-good.
                est = estimated_speedup(
                    text.shape[0], pattern.shape[0], jax.device_count()
                )
                forced = (
                    os.environ.get("SEQALIGN_SEQUENCE_PARALLEL") == "1"
                )
                if est > 0 and (forced or est >= 1.2):
                    return self._align_sequence_parallel(
                        text, pattern, sm, alphabet_size, gap_penalty
                    )
            if direct.fits_direct(text.shape[0], pattern.shape[0]):
                return self._direct_with_fallback(
                    text, pattern, sm, alphabet_size, gap_penalty
                )
            return self._align_checkpoint(
                text, pattern, sm, alphabet_size, gap_penalty
            )
        score, bi, bj, words, steps_pad = wavefront.wavefront_fill(
            text, pattern, sm, alphabet_size, gap_penalty,
            local=self.local, with_dirs=True,
            interpret=config.pallas_interpret(),
        )
        aligned_text, aligned_pattern, start_t, start_p = (
            bindings.traceback_skewed(
                1 if self.local else 0, words, steps_pad, text, pattern,
                alphabet_size, best_i=bi, best_j=bj,
                rps=wavefront.ROWS_PER_SLOT,
            )
        )
        return AlignmentResult(
            aligned_text=aligned_text,
            aligned_pattern=aligned_pattern,
            start_in_aligned_text=start_t,
            start_in_aligned_pattern=start_p,
            score=score,
        )

    def _align_sequence_parallel(self, text, pattern, score_matrix,
                                 alphabet_size, gap_penalty,
                                 gap_extend=None):
        """Multi-device single-pair alignment: the phase-1 checkpoint
        fill pipelines wavefront strips across the mesh (device d owns
        strip d; ckpt_cols text chunks flow through with ppermute halos
        of the bottom-row/F streams), then the standard single-chip
        path-tile traceback walks the result — the wavefront-speed
        multi-chip analog of the reference's stream pipeline
        (alignSequenceGPU.cu:14-40, 470-484)."""
        from ..ops.checkpoint import checkpointed_traceback
        from ..parallel.sequence import (
            sequence_parallel_checkpointed_fill,
        )

        text = np.asarray(text, dtype=np.int32)
        pattern = np.asarray(pattern, dtype=np.int32)
        sm = self._score_matrix(score_matrix, alphabet_size)
        ck = sequence_parallel_checkpointed_fill(
            text, pattern, sm, alphabet_size, gap_penalty,
            local=self.local, gap_extend=gap_extend,
        )
        aligned_text, aligned_pattern, start_t, start_p = (
            checkpointed_traceback(ck, text, pattern, sm, alphabet_size)
        )
        return AlignmentResult(
            aligned_text=aligned_text,
            aligned_pattern=aligned_pattern,
            start_in_aligned_text=start_t,
            start_in_aligned_pattern=start_p,
            score=ck.score,
        )

    def _align_direct(self, text, pattern, score_matrix, alphabet_size,
                      gap_penalty, gap_extend=None):
        """One-dispatch path: strip fill + device best-cell merge +
        in-kernel walk (ops/direct.py); only score/cell/packed moves
        return to the host."""
        from ..ops import direct

        sm = self._score_matrix(score_matrix, alphabet_size)
        score, _, _, aligned_text, aligned_pattern, start_t, start_p = (
            direct.direct_align(
                np.asarray(text, dtype=np.int32),
                np.asarray(pattern, dtype=np.int32),
                sm, alphabet_size, gap_penalty, local=self.local,
                gap_extend=gap_extend,
            )
        )
        return AlignmentResult(
            aligned_text=aligned_text,
            aligned_pattern=aligned_pattern,
            start_in_aligned_text=start_t,
            start_in_aligned_pattern=start_p,
            score=score,
        )

    def _direct_with_fallback(self, text, pattern, score_matrix,
                              alphabet_size, gap_penalty, gap_extend=None):
        """Direct one-dispatch path, falling back to the checkpointed
        engine if the direction-word slab doesn't fit device HBM at
        runtime (fits_direct budgets a dedicated chip; a co-tenant can
        shrink what's really free)."""
        try:
            return self._align_direct(
                text, pattern, score_matrix, alphabet_size, gap_penalty,
                gap_extend=gap_extend,
            )
        except RuntimeError as e:
            msg = str(e)
            if (
                "RESOURCE_EXHAUSTED" not in msg
                and "out of memory" not in msg.lower()
            ):
                raise
            return self._align_checkpoint(
                text, pattern, score_matrix, alphabet_size, gap_penalty,
                gap_extend=gap_extend,
            )

    def _align_checkpoint(self, text, pattern, score_matrix, alphabet_size,
                          gap_penalty, gap_extend=None):
        """O(boundary)-memory engine for very long pairs: score-only fill
        with tile checkpoints, then per-tile direction re-fill along the
        optimal path only (ops/checkpoint.py).  Also the accelerator's
        affine (Gotoh) path when gap_extend is set."""
        from ..ops import checkpoint

        sm = self._score_matrix(score_matrix, alphabet_size)
        score, _, _, aligned_text, aligned_pattern, start_t, start_p = (
            checkpoint.checkpointed_align(
                np.asarray(text, dtype=np.int32),
                np.asarray(pattern, dtype=np.int32),
                sm, alphabet_size, gap_penalty, local=self.local,
                gap_extend=gap_extend,
            )
        )
        return AlignmentResult(
            aligned_text=aligned_text,
            aligned_pattern=aligned_pattern,
            start_in_aligned_text=start_t,
            start_in_aligned_pattern=start_p,
            score=score,
        )

    def _fill_pallas(self, text, pattern, score_matrix, alphabet_size,
                     gap_penalty):
        """Run the Pallas pair kernel; returns (words(np), score, bi, bj)."""
        n = int(np.asarray(text).shape[0])
        m = int(np.asarray(pattern).shape[0])
        sm = self._score_matrix(score_matrix, alphabet_size)
        profile, p_cols = pallas_fill.build_pair_profile(
            jnp.asarray(np.asarray(text, dtype=np.int32)),
            jnp.asarray(sm),
            alphabet_size,
        )
        m_pad = max(
            pallas_fill.ROWS_PER_STEP,
            ((m + pallas_fill.ROWS_PER_STEP - 1) // pallas_fill.ROWS_PER_STEP)
            * pallas_fill.ROWS_PER_STEP,
        )
        dirs_bytes = (m_pad // pallas_fill.DIR_ROWS_PER_WORD) * p_cols * 4
        avail = config.available_host_bytes()
        dirs_budget = config.MAX_DIRS_BYTES
        if avail is not None:
            dirs_budget = min(dirs_budget, avail // 2)
        if (
            dirs_bytes > dirs_budget
            or p_cols > 65536
            or m_pad > pallas_fill.MAX_CHUNK_ROWS
        ):
            # Long pair: stream through the tiled engine instead.
            from ..ops import tiled

            result = tiled.tiled_fill(
                np.asarray(text, dtype=np.int32),
                np.asarray(pattern, dtype=np.int32),
                sm, alphabet_size, gap_penalty, local=self.local,
            )
            return (
                result.words,
                result.score,
                result.best_i,
                result.best_j,
            )
        pat = np.zeros(m_pad, dtype=np.int32)
        pat[:m] = np.asarray(pattern, dtype=np.int32)
        dirs, score, bi, bj = pallas_fill.pair_fill_pallas(
            profile,
            jnp.asarray(pat),
            gap_penalty,
            n,
            m,
            local=self.local,
            interpret=config.pallas_interpret(),
        )
        words = np.asarray(jax.device_get(dirs))
        return words.reshape(words.shape[0], -1), int(score), int(bi), int(bj)

    # -- public API ----------------------------------------------------------

    def align(self, text, pattern, score_matrix, alphabet_size, gap_penalty,
              gap_extend=None):
        if gap_extend is not None:
            # Affine (Gotoh, extension): one-dispatch direct path when
            # the pair fits a strip, else the checkpointed wavefront
            # engine; the portable XLA engine has no affine traceback,
            # so non-Pallas backends use the native oracle.
            if config.use_pallas():
                from ..ops import direct

                n = int(np.asarray(text).shape[0])
                m = int(np.asarray(pattern).shape[0])
                if direct.fits_direct(n, m, affine=True):
                    return self._direct_with_fallback(
                        text, pattern, score_matrix, alphabet_size,
                        gap_penalty, gap_extend=gap_extend,
                    )
                return self._align_checkpoint(
                    text, pattern, score_matrix, alphabet_size,
                    gap_penalty, gap_extend=gap_extend,
                )
            return self._align_oracle_affine(
                text, pattern, score_matrix, alphabet_size, gap_penalty,
                gap_extend,
            )
        if config.use_pallas():
            engine = config.pair_engine()
            if engine == "strip":
                return self._align_pallas(
                    text, pattern, score_matrix, alphabet_size, gap_penalty
                )
            if engine == "checkpoint":
                return self._align_checkpoint(
                    text, pattern, score_matrix, alphabet_size, gap_penalty
                )
            return self._align_wavefront(
                text, pattern, score_matrix, alphabet_size, gap_penalty
            )
        return self._align_xla(
            text, pattern, score_matrix, alphabet_size, gap_penalty
        )

    def _align_oracle_affine(self, text, pattern, score_matrix,
                             alphabet_size, gap_penalty, gap_extend):
        sm = self._score_matrix(score_matrix, alphabet_size)
        at, ap, st, sp, score = bindings.oracle_align_affine(
            1 if self.local else 0,
            np.asarray(text, dtype=np.int8),
            np.asarray(pattern, dtype=np.int8),
            sm, alphabet_size, gap_penalty, gap_extend,
        )
        return AlignmentResult(
            aligned_text=at,
            aligned_pattern=ap,
            start_in_aligned_text=st,
            start_in_aligned_pattern=sp,
            score=score,
        )

    def _align_pallas(self, text, pattern, score_matrix, alphabet_size,
                      gap_penalty):
        words, score, bi, bj = self._fill_pallas(
            text, pattern, score_matrix, alphabet_size, gap_penalty
        )
        if config.traceback_mode() == "device":
            from ..ops.traceback import run_device_traceback

            n = int(np.asarray(text).shape[0])
            m = int(np.asarray(pattern).shape[0])
            aligned_text, aligned_pattern, start_t, start_p = (
                run_device_traceback(
                    words, text, pattern, n, m, bi, bj,
                    alphabet_size, self.local,
                )
            )
        else:
            aligned_text, aligned_pattern, start_t, start_p = (
                bindings.traceback_packed(
                    1 if self.local else 0,
                    words,
                    text,
                    pattern,
                    alphabet_size,
                    best_i=bi,
                    best_j=bj,
                )
            )
        return AlignmentResult(
            aligned_text=aligned_text,
            aligned_pattern=aligned_pattern,
            start_in_aligned_text=start_t,
            start_in_aligned_pattern=start_p,
            score=score,
        )

    def _align_xla(self, text, pattern, score_matrix, alphabet_size,
                   gap_penalty):
        raise NotImplementedError

    def score(self, text, pattern, score_matrix, alphabet_size,
              gap_penalty) -> int:
        """Score-only fill (no direction matrix, no traceback)."""
        raise NotImplementedError
