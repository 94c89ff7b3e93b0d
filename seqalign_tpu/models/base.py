"""Shared pairwise-aligner machinery for the accelerator models."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..ops import scan_engine


@dataclasses.dataclass
class AlignmentResult:
    """Engine-level alignment result (alphabet indices, gap == K)."""

    aligned_text: np.ndarray
    aligned_pattern: np.ndarray
    start_in_aligned_text: int
    start_in_aligned_pattern: int
    score: int


class PairAligner:
    """Base: device DP fill + host traceback for one sequence pair."""

    local: bool = False

    def _prepare(self, text, pattern, score_matrix, alphabet_size):
        """Build padded device inputs; returns (profile, pattern_dev, n, m)."""
        n = int(np.asarray(text).shape[0])
        m = int(np.asarray(pattern).shape[0])
        width = scan_engine.padded_width(n)
        m_pad = scan_engine.padded_rows(m)
        sm = np.ascontiguousarray(
            np.asarray(score_matrix, dtype=np.int32).reshape(-1)[
                : alphabet_size * alphabet_size
            ].reshape(alphabet_size, alphabet_size)
        )
        profile = scan_engine.build_profile(
            jnp.asarray(np.asarray(text, dtype=np.int32)),
            jnp.asarray(sm),
            width,
        )
        pattern_dev = jnp.asarray(
            scan_engine.pad_pattern(np.asarray(pattern, dtype=np.int32), m_pad)
        )
        return profile, pattern_dev, n, m

    def align(self, text, pattern, score_matrix, alphabet_size, gap_penalty):
        raise NotImplementedError

    def score(self, text, pattern, score_matrix, alphabet_size, gap_penalty) -> int:
        """Score-only fill (no direction matrix, no traceback)."""
        raise NotImplementedError
