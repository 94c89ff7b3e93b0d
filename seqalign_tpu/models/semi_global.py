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
        # Affine semi-global is undefined; api.align_tpu rejects it
        # before dispatch, so gap_extend is always None here.
        assert gap_extend is None
        if config.use_pallas():
            return self._align_checkpoint_semi(
                text, pattern, score_matrix, alphabet_size, gap_penalty
            )
        return self._align_xla(
            text, pattern, score_matrix, alphabet_size, gap_penalty
        )

    def _align_checkpoint_semi(self, text, pattern, score_matrix,
                               alphabet_size, gap_penalty):
        from ..ops import checkpoint, direct

        sm = self._score_matrix(score_matrix, alphabet_size)
        text = np.asarray(text, dtype=np.int32)
        pattern = np.asarray(pattern, dtype=np.int32)
        if direct.fits_direct(text.shape[0], pattern.shape[0]):
            # One-dispatch path (fill + device best-of-last-row + walk).
            score, _, _, aligned_text, aligned_pattern, start_t, start_p = (
                direct.direct_align(
                    text, pattern, sm, alphabet_size, gap_penalty,
                    semi=True,
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
