"""Semi-global ("fit") alignment model — extension beyond the reference
(its SEMI_GLOBAL enum value is unreachable from its CLI): the pattern
aligns globally while text end-gaps are free.  The native oracle defines
the contract; Pallas backends run the checkpointed wavefront engine
(semi mode), CPU backends the XLA row-scan fill."""

from __future__ import annotations

import numpy as np

from .. import config
from ..native import bindings
from ..ops import scan_engine
from .base import AlignmentResult, PairAligner


class SemiGlobal(PairAligner):
    local = False

    def align(self, text, pattern, score_matrix, alphabet_size, gap_penalty,
              gap_extend=None):
        # gap_extend: affine (Gotoh) fit — oracle algo=2 semantics
        # (sa_fill_affine / sa_align_affine); rides the same direct /
        # checkpointed engines as linear semi.
        if config.use_pallas():
            return self._align_checkpoint_semi(
                text, pattern, score_matrix, alphabet_size, gap_penalty,
                gap_extend=gap_extend,
            )
        if gap_extend is not None:
            # The portable XLA engine has no affine traceback; use the
            # native oracle (as PairAligner.align does for global/local).
            sm = self._score_matrix(score_matrix, alphabet_size)
            at, ap, st, sp, score = bindings.oracle_align_affine(
                2,
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
        return self._align_xla(
            text, pattern, score_matrix, alphabet_size, gap_penalty
        )

    def _align_checkpoint_semi(self, text, pattern, score_matrix,
                               alphabet_size, gap_penalty, gap_extend=None):
        from ..ops import checkpoint, direct

        sm = self._score_matrix(score_matrix, alphabet_size)
        text = np.asarray(text, dtype=np.int32)
        pattern = np.asarray(pattern, dtype=np.int32)
        affine = gap_extend is not None
        if direct.fits_direct(text.shape[0], pattern.shape[0],
                              affine=affine):
            # One-dispatch path (fill + device best-of-last-row + walk).
            score, _, _, aligned_text, aligned_pattern, start_t, start_p = (
                direct.direct_align(
                    text, pattern, sm, alphabet_size, gap_penalty,
                    semi=True, gap_extend=gap_extend,
                )
            )
            return AlignmentResult(
                aligned_text=aligned_text,
                aligned_pattern=aligned_pattern,
                start_in_aligned_text=start_t,
                start_in_aligned_pattern=start_p,
                score=score,
            )
        score, _, _, aligned_text, aligned_pattern, start_t, start_p = (
            checkpoint.checkpointed_align(
                text, pattern, sm, alphabet_size, gap_penalty, semi=True,
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

    def _align_xla(self, text, pattern, score_matrix, alphabet_size,
                   gap_penalty):
        profile, pattern_dev, n, m = self._prepare_xla(
            text, pattern, score_matrix, alphabet_size
        )
        dirs, best, best_idx = scan_engine.semi_fill(
            profile, pattern_dev, gap_penalty, n, m, with_dirs=True
        )
        dirs_np = scan_engine.to_numpy_dirs(dirs)[: m + 1]
        aligned_text, aligned_pattern, start_t, start_p = bindings.traceback(
            2, dirs_np, text, pattern, alphabet_size, best_idx=int(best_idx)
        )
        return AlignmentResult(
            aligned_text=aligned_text,
            aligned_pattern=aligned_pattern,
            start_in_aligned_text=start_t,
            start_in_aligned_pattern=start_p,
            score=int(best),
        )

    def score(self, text, pattern, score_matrix, alphabet_size, gap_penalty):
        profile, pattern_dev, n, m = self._prepare_xla(
            text, pattern, score_matrix, alphabet_size
        )
        _, best, _ = scan_engine.semi_fill(
            profile, pattern_dev, gap_penalty, n, m, with_dirs=False
        )
        return int(best)
