"""Pallas kernel tests (interpreter mode — exact semantics, no TPU).

Validates both kernel families against the native oracle: scores, packed
direction words (bit-identical), best-cell coordinates, and the full
align() path through the packed traceback.
"""

import numpy as np
import pytest

from seqalign_tpu.constants import AlignmentType, Device
from seqalign_tpu.native import bindings
from seqalign_tpu.ops import pallas_fill

from .helpers import request_from_strings, random_dna, random_protein, response_tuple, run

jnp = pytest.importorskip("jax.numpy")


def _dna_sm():
    return np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)


@pytest.mark.parametrize("local", [False, True])
def test_batch_kernel_matches_oracle(local):
    rng = np.random.default_rng(0)
    sm = _dna_sm()
    b, n, m = pallas_fill.TILE_PAIRS, 128, 128
    texts = rng.integers(0, 4, (b, n)).astype(np.int32)
    pats = rng.integers(0, 4, (b, m)).astype(np.int32)
    ns = rng.integers(1, n + 1, b).astype(np.int32)
    ms = rng.integers(1, m + 1, b).astype(np.int32)
    got = np.asarray(
        pallas_fill.batch_score_pallas(
            jnp.asarray(texts), jnp.asarray(pats), jnp.asarray(ns),
            jnp.asarray(ms), jnp.asarray(sm), 5,
            k_alpha=4, local=local, interpret=True,
        )
    )
    # Interpreter mode is slow; spot-check a sample of pairs.
    for i in rng.choice(b, 24, replace=False):
        want = bindings.oracle_fill(
            1 if local else 0,
            texts[i, : ns[i]].astype(np.int8),
            pats[i, : ms[i]].astype(np.int8),
            sm, 4, 5,
        )[1]
        assert got[i] == want


def _unpack(words: np.ndarray, m: int) -> np.ndarray:
    """(words, P) int32 -> (m, P) dirs for DP rows 1..m."""
    words = words.reshape(words.shape[0], -1)
    rows = np.arange(1, m + 1)
    w = words[(rows - 1) // 16]
    shift = (2 * ((rows - 1) % 16))[:, None]
    return (w >> shift) & 3


@pytest.mark.parametrize("local", [False, True])
def test_pair_kernel_dirs_bit_identical(local):
    rng = np.random.default_rng(1)
    sm = _dna_sm()
    for _ in range(4):
        n = int(rng.integers(1, 300))
        m = int(rng.integers(1, 300))
        n, m = max(n, m), min(n, m)
        t = rng.integers(0, 4, n).astype(np.int32)
        p = rng.integers(0, 4, m).astype(np.int32)
        prof, p_cols = pallas_fill.build_pair_profile(
            jnp.asarray(t), jnp.asarray(sm), 4
        )
        m_pad = ((m + 127) // 128) * 128
        pat = np.zeros(m_pad, np.int32)
        pat[:m] = p
        dirs, score, bi, bj = pallas_fill.pair_fill_pallas(
            prof, jnp.asarray(pat), 5, n, m, local=local, interpret=True
        )
        odirs, oscore, obest = bindings.oracle_fill(
            1 if local else 0, t.astype(np.int8), p.astype(np.int8), sm, 4, 5
        )
        assert int(score) == oscore
        got = _unpack(np.asarray(dirs), m)[:, :n]
        np.testing.assert_array_equal(got, odirs[1:, 1:])
        if local:
            assert (int(bi), int(bj)) == (obest // (n + 1), obest % (n + 1))


@pytest.mark.parametrize("alignment_type", [AlignmentType.GLOBAL, AlignmentType.LOCAL])
def test_full_align_through_pallas_engine(alignment_type, monkeypatch):
    monkeypatch.setenv("SEQALIGN_ENGINE", "pallas_interpret")
    rng = np.random.default_rng(5)
    text = random_dna(rng, 150)
    pattern = random_dna(rng, 90)
    request = request_from_strings(
        text, pattern, alignment_type=alignment_type, gap_penalty=5
    )
    tpu = run(request, Device.TPU)
    monkeypatch.delenv("SEQALIGN_ENGINE")
    cpu = run(request, Device.CPU)
    assert response_tuple(cpu) == response_tuple(tpu)
