"""In-kernel Pallas walker parity vs the XLA window walkers
(interpreter mode; the real-TPU path is covered by the scale tier)."""

import numpy as np
import pytest

from seqalign_tpu.ops.pallas_walk import (
    pallas_walk_skewed_window,
    unpack_moves,
)
from seqalign_tpu.ops.traceback import (
    device_walk_affine_skewed_window,
    device_walk_skewed_window,
    pack_words_skewed,
)


@pytest.mark.parametrize("local", [False, True])
def test_pallas_walker_matches_xla(local):
    rng = np.random.default_rng(41)
    rps, slots = 2, 128
    rows, cols = rps * slots, 300
    hi = 4 if local else 3
    dirs_bytes = rng.integers(0, hi, (rows + 1, cols + 1)).astype(np.uint8)
    words = np.asarray(pack_words_skewed(dirs_bytes, rps, slots))
    row_lo, col_lo = 64, 512
    for trial in range(4):
        i = int(rng.integers(row_lo + 1, row_lo + rows + 1))
        j = int(rng.integers(col_lo + 1, col_lo + cols + 1))
        out, k, i_d, j_d, done_d = device_walk_skewed_window(
            words, rps, row_lo, col_lo, i, j, local, rows + cols + 1
        )
        k = int(k)
        mv, k2, i2, j2, _, done2 = pallas_walk_skewed_window(
            words, None, rps, row_lo, col_lo, i, j, 0, local, False,
            rows + cols + 1, interpret=True,
        )
        assert k == int(k2)
        np.testing.assert_array_equal(
            np.asarray(out)[:k].astype(np.uint8), unpack_moves(mv, k)
        )
        assert (int(i_d), int(j_d), bool(done_d)) == (
            int(i2), int(j2), bool(done2),
        )


@pytest.mark.parametrize("local", [False, True])
def test_pallas_walker_affine_matches_xla(local):
    rng = np.random.default_rng(42)
    rps, slots = 2, 128
    rows, cols = rps * slots, 260
    hi = 4 if local else 3
    dirs_bytes = rng.integers(0, hi, (rows + 1, cols + 1)).astype(np.uint8)
    bits_bytes = rng.integers(0, 4, (rows + 1, cols + 1)).astype(np.uint8)
    words = np.asarray(pack_words_skewed(dirs_bytes, rps, slots))
    words2 = np.asarray(pack_words_skewed(bits_bytes, rps, slots))
    for trial in range(4):
        i = int(rng.integers(1, rows + 1))
        j = int(rng.integers(1, cols + 1))
        st = int(rng.integers(0, 3))
        out, k, i_d, j_d, st_d, done_d = device_walk_affine_skewed_window(
            words, words2, rps, 0, 0, i, j, st, local, rows + cols + 1
        )
        k = int(k)
        mv, k2, i2, j2, st2, done2 = pallas_walk_skewed_window(
            words, words2, rps, 0, 0, i, j, st, local, True,
            rows + cols + 1, interpret=True,
        )
        assert k == int(k2)
        np.testing.assert_array_equal(
            np.asarray(out)[:k].astype(np.uint8), unpack_moves(mv, k)
        )
        assert (int(i_d), int(j_d), int(st_d), bool(done_d)) == (
            int(i2), int(j2), int(st2), bool(done2),
        )
