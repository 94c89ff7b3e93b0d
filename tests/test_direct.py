"""Single-dispatch direct engine (ops/direct.py) vs the oracle
(interpreter mode, tiny strip geometry)."""

import numpy as np
import pytest

from seqalign_tpu.native import bindings
from seqalign_tpu.ops import direct


def _dna_sm():
    return np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("SEQALIGN_ENGINE", "pallas_interpret")


@pytest.mark.parametrize(
    "mode", [{}, {"local": True}, {"semi": True}]
)
def test_direct_matches_oracle(mode):
    rng = np.random.default_rng(51)
    sm = _dna_sm()
    for trial in range(3):
        n = int(rng.integers(200, 1800))
        m = int(rng.integers(50, 900))
        gap = int(rng.integers(1, 8))
        text = rng.integers(0, 4, n).astype(np.int32)
        pattern = rng.integers(0, 4, m).astype(np.int32)
        score, bi, bj, at, ap, st, sp = direct.direct_align(
            text, pattern, sm, 4, gap, rps=1, slots=1024, **mode
        )
        algo = 2 if mode.get("semi") else (1 if mode.get("local") else 0)
        oat, oap, ost, osp, oscore = bindings.oracle_align(
            algo, text.astype(np.int8), pattern.astype(np.int8),
            sm, 4, gap,
        )
        assert score == oscore, (trial, n, m, gap, mode)
        np.testing.assert_array_equal(at, oat)
        np.testing.assert_array_equal(ap, oap)
        assert (st, sp) == (ost, osp)


@pytest.mark.parametrize("local", [False, True])
def test_direct_affine_matches_oracle(local):
    rng = np.random.default_rng(52)
    sm = _dna_sm()
    for trial in range(2):
        n = int(rng.integers(200, 1500))
        m = int(rng.integers(50, 800))
        text = rng.integers(0, 4, n).astype(np.int32)
        pattern = rng.integers(0, 4, m).astype(np.int32)
        score, _, _, at, ap, st, sp = direct.direct_align(
            text, pattern, sm, 4, 7, local=local, gap_extend=2,
            rps=1, slots=1024,
        )
        oat, oap, ost, osp, oscore = bindings.oracle_align_affine(
            1 if local else 0, text.astype(np.int8),
            pattern.astype(np.int8), sm, 4, 7, 2,
        )
        assert score == oscore, (trial, n, m, local)
        np.testing.assert_array_equal(at, oat)
        np.testing.assert_array_equal(ap, oap)
        assert (st, sp) == (ost, osp)


def test_direct_sw_no_match():
    sm = np.full((4, 4), -4, dtype=np.int32)
    text = np.zeros(700, np.int32)
    pattern = np.ones(90, np.int32)
    score, bi, bj, at, ap, st, sp = direct.direct_align(
        text, pattern, sm, 4, 5, local=True, rps=1, slots=1024
    )
    oat, oap, ost, osp, oscore = bindings.oracle_align(
        1, text.astype(np.int8), pattern.astype(np.int8), sm, 4, 5
    )
    assert score == oscore == 0
    assert at.shape[0] == 0
    assert (st, sp) == (ost, osp)


def test_fits_direct_bounds():
    assert direct.fits_direct(4096, 4096)
    assert direct.fits_direct(65536, 65536)
    assert not direct.fits_direct(500000, 500000)
    assert not direct.fits_direct(100000, 70000)  # move cap
