"""On-device traceback vs the native host traceback."""

import numpy as np
import pytest

from seqalign_tpu.native import bindings
from seqalign_tpu.ops.traceback import pack_words, run_device_traceback


def _dna_sm():
    return np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)


@pytest.mark.parametrize("local", [False, True])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_traceback_matches_native(local, seed):
    rng = np.random.default_rng(seed)
    sm = _dna_sm()
    n = int(rng.integers(2, 200))
    m = int(rng.integers(1, n + 1))
    text = rng.integers(0, 4, n).astype(np.int8)
    pattern = rng.integers(0, 4, m).astype(np.int8)
    dirs, score, best = bindings.oracle_fill(
        1 if local else 0, text, pattern, sm, 4, 5
    )
    words = pack_words(dirs)
    bi, bj = best // (n + 1), best % (n + 1)

    at, ap, st, sp = run_device_traceback(
        words, text, pattern, n, m, bi, bj, 4, local
    )
    wat, wap, wst, wsp = bindings.traceback_packed(
        1 if local else 0, words, text, pattern, 4, best_i=bi, best_j=bj
    )
    np.testing.assert_array_equal(at, wat)
    np.testing.assert_array_equal(ap, wap)
    assert (st, sp) == (wst, wsp)

    # And both agree with the oracle's own traceback.
    oat, oap, ost, osp, _ = bindings.oracle_align(
        1 if local else 0, text, pattern, sm, 4, 5
    )
    np.testing.assert_array_equal(at, oat)
    np.testing.assert_array_equal(ap, oap)
    assert (st, sp) == (ost, osp)


def test_device_traceback_mode_through_models(monkeypatch):
    """Full align() with SEQALIGN_TRACEBACK=device (strip engine)."""
    monkeypatch.setenv("SEQALIGN_ENGINE", "pallas_interpret")
    monkeypatch.setenv("SEQALIGN_PAIR_ENGINE", "strip")
    monkeypatch.setenv("SEQALIGN_TRACEBACK", "device")
    from seqalign_tpu.constants import AlignmentType, Device

    from .helpers import request_from_strings, random_dna, response_tuple, run

    rng = np.random.default_rng(4)
    text = random_dna(rng, 170)
    pattern = random_dna(rng, 90)
    for algo in (AlignmentType.GLOBAL, AlignmentType.LOCAL):
        request = request_from_strings(text, pattern, alignment_type=algo)
        tpu = run(request, Device.TPU)
        monkeypatch.delenv("SEQALIGN_ENGINE")
        cpu = run(request, Device.CPU)
        monkeypatch.setenv("SEQALIGN_ENGINE", "pallas_interpret")
        assert response_tuple(cpu) == response_tuple(tpu)
