"""Local alignment model (Smith-Waterman, linear gap penalty)."""

from __future__ import annotations

from ..native import bindings
from ..ops import scan_engine
from .base import AlignmentResult, PairAligner


class SmithWaterman(PairAligner):
    """Device row-scan fill (with on-device tracking of the best cell, the
    analog of the reference's block max-reduce, alignSequenceGPU.cu:203-216)
    + host traceback from the best cell."""

    local = True

    def _align_xla(self, text, pattern, score_matrix, alphabet_size,
                   gap_penalty):
        profile, pattern_dev, n, m = self._prepare_xla(
            text, pattern, score_matrix, alphabet_size
        )
        dirs, best, best_idx = scan_engine.sw_fill(
            profile, pattern_dev, gap_penalty, n, m, with_dirs=True
        )
        dirs_np = scan_engine.to_numpy_dirs(dirs)[: m + 1]
        aligned_text, aligned_pattern, start_t, start_p = bindings.traceback(
            1, dirs_np, text, pattern, alphabet_size, best_idx=int(best_idx)
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
        _, best, _ = scan_engine.sw_fill(
            profile, pattern_dev, gap_penalty, n, m, with_dirs=False
        )
        return int(best)
