"""Global alignment model (Needleman-Wunsch, linear gap penalty)."""

from __future__ import annotations

from ..native import bindings
from ..ops import scan_engine
from .base import AlignmentResult, PairAligner


class NeedlemanWunsch(PairAligner):
    """Device row-scan fill + host traceback from the device's direction
    matrix — same split as the reference GPU engine, whose traceback also
    runs on host (alignSequenceGPU.cu:631-640)."""

    local = False

    def _align_xla(self, text, pattern, score_matrix, alphabet_size,
                   gap_penalty):
        profile, pattern_dev, n, m = self._prepare_xla(
            text, pattern, score_matrix, alphabet_size
        )
        dirs, score = scan_engine.nw_fill(
            profile, pattern_dev, gap_penalty, n, m, with_dirs=True
        )
        dirs_np = scan_engine.to_numpy_dirs(dirs)[: m + 1]
        aligned_text, aligned_pattern, start_t, start_p = bindings.traceback(
            0, dirs_np, text, pattern, alphabet_size
        )
        return AlignmentResult(
            aligned_text=aligned_text,
            aligned_pattern=aligned_pattern,
            start_in_aligned_text=start_t,
            start_in_aligned_pattern=start_p,
            score=int(score),
        )

    def score(self, text, pattern, score_matrix, alphabet_size, gap_penalty):
        profile, pattern_dev, n, m = self._prepare_xla(
            text, pattern, score_matrix, alphabet_size
        )
        _, score = scan_engine.nw_fill(
            profile, pattern_dev, gap_penalty, n, m, with_dirs=False
        )
        return int(score)
