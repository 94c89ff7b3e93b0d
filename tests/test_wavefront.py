"""Skewed-wavefront kernel tests (interpreter mode) vs the oracle."""

import numpy as np
import pytest

from seqalign_tpu.native import bindings
from seqalign_tpu.ops.wavefront import SLOTS, strip_rows, wavefront_fill


def _dna_sm():
    return np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)


def _skew_dirs(words, steps_pad, rps, m, n):
    """Decode the skewed word format into (m, n) direction bytes."""
    out = np.empty((m, n), dtype=np.int32)
    rows = strip_rows(rps)
    for i in range(1, m + 1):
        c = (i - 1) // rows
        ri = (i - 1) % rows
        s = ri // rps
        r = ri % rps
        t = np.arange(1, n + 1) - 1 + s
        w = words[c, (t // 16) * rps + r, s]
        out[i - 1] = (w >> (2 * (t % 16))) & 3
    return out


@pytest.mark.parametrize("local", [False, True])
@pytest.mark.parametrize("rps", [1, 8])
def test_wavefront_matches_oracle(local, rps):
    rng = np.random.default_rng(17 + rps)
    sm = _dna_sm()
    # Cross a strip boundary for rps=1 (1024 rows/strip).
    n, m = 1500, 1100
    text = rng.integers(0, 4, n).astype(np.int32)
    pattern = rng.integers(0, 4, m).astype(np.int32)

    score, bi, bj, words, steps_pad = wavefront_fill(
        text, pattern, sm, 4, 5, local=local, with_dirs=True, rps=rps,
        interpret=True,
    )
    odirs, oscore, obest = bindings.oracle_fill(
        1 if local else 0, text.astype(np.int8), pattern.astype(np.int8),
        sm, 4, 5,
    )
    assert score == oscore
    if local:
        assert (bi, bj) == (obest // (n + 1), obest % (n + 1))

    np.testing.assert_array_equal(
        _skew_dirs(words, steps_pad, rps, m, n), odirs[1:, 1:]
    )

    at, ap, st, sp = bindings.traceback_skewed(
        1 if local else 0, words, steps_pad, text, pattern, 4,
        best_i=bi, best_j=bj, rps=rps,
    )
    oat, oap, ost, osp, _ = bindings.oracle_align(
        1 if local else 0, text.astype(np.int8), pattern.astype(np.int8),
        sm, 4, 5,
    )
    np.testing.assert_array_equal(at, oat)
    np.testing.assert_array_equal(ap, oap)
    assert (st, sp) == (ost, osp)


def test_wavefront_multistrip_rps8():
    # Cross the 8192-row strip boundary at rps=8.
    rng = np.random.default_rng(3)
    sm = _dna_sm()
    n, m = 9000, 8500
    text = rng.integers(0, 4, n).astype(np.int32)
    pattern = rng.integers(0, 4, m).astype(np.int32)
    score, bi, bj, words, steps_pad = wavefront_fill(
        text, pattern, sm, 4, 5, local=True, with_dirs=False, rps=8,
        interpret=True,
    )
    _, oscore, obest = bindings.oracle_fill(
        1, text.astype(np.int8), pattern.astype(np.int8), sm, 4, 5
    )
    assert score == oscore
    assert (bi, bj) == (obest // (n + 1), obest % (n + 1))


def test_wavefront_protein():
    rng = np.random.default_rng(9)
    from seqalign_tpu.bench.suite import _blosum50

    sm = _blosum50()
    n, m = 400, 250
    text = rng.integers(0, 23, n).astype(np.int32)
    pattern = rng.integers(0, 23, m).astype(np.int32)
    score, bi, bj, words, steps_pad = wavefront_fill(
        text, pattern, sm, 23, 7, local=True, with_dirs=True, interpret=True
    )
    _, oscore, obest = bindings.oracle_fill(
        1, text.astype(np.int8), pattern.astype(np.int8), sm, 23, 7
    )
    assert score == oscore
    assert (bi, bj) == (obest // (n + 1), obest % (n + 1))
