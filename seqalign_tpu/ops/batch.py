"""Batched many-pair alignment (score-only fills).

The reference only *benchmarks* batches by looping requests sequentially
(reference: tests/benchmarks.cu:271-332); here batching is a first-class
capability: pairs are padded into (N_pad, M_pad) buckets and vmapped, so
thousands of pairs fill concurrently per chip.  Query profiles are built
on device inside the vmapped body (one gather per pair).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .scan_engine import (
    PAD_SCORE,
    affine_score_fill,
    nw_score,
    semi_fill,
    sw_score,
)

_INT = jnp.int32


@functools.partial(jax.jit, static_argnames=("local", "semi"))
def batch_score(texts, patterns, ns, ms, score_matrix, gap,
                local: bool = False, semi: bool = False, gap_extend=None):
    """Optimal scores for a padded batch of pairs.

    Args:
      texts: (B, N_pad) int32 alphabet indices (padding value arbitrary).
      patterns: (B, M_pad) int32 alphabet indices.
      ns, ms: (B,) real lengths.
      score_matrix: (K, K) int32, shared across the batch.
      gap: scalar gap penalty (affine: gap-open cost).
      local: Smith-Waterman when True, else Needleman-Wunsch.
      semi: semi-global ("fit") scoring when True (mutually exclusive
        with local; composes with gap_extend for affine fit).
      gap_extend: when given, affine (Gotoh) gap costs — a run of length
        L costs gap + (L-1)*gap_extend; requires gap >= gap_extend (the
        row prefix-max identity needs it).  None = linear (reference).

    Returns (B,) int32 scores.
    """
    assert not (semi and local)
    n_pad = texts.shape[1]
    col = jnp.arange(n_pad, dtype=_INT)
    sm = score_matrix.astype(_INT)

    def one(text, pattern, n, m):
        profile = sm[:, text]
        profile = jnp.where(col < n, profile, PAD_SCORE)
        if gap_extend is not None:
            score, _ = affine_score_fill(
                profile, pattern, gap, gap_extend, n, m, local=local,
                semi=semi,
            )
            return score
        if semi:
            _, best, _ = semi_fill(
                profile, pattern, gap, n, m, with_dirs=False
            )
            return best
        if local:
            return sw_score(profile, pattern, gap, n, m)
        return nw_score(profile, pattern, gap, n, m)

    return jax.vmap(one)(texts, patterns, ns.astype(_INT), ms.astype(_INT))
