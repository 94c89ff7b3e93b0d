"""Checkpointed long-pair engine tests (interpreter mode, tiny tiles to
force multi-tile traceback paths)."""

import numpy as np
import pytest

from seqalign_tpu.native import bindings
from seqalign_tpu.ops import checkpoint


def _dna_sm():
    return np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("SEQALIGN_ENGINE", "pallas_interpret")


@pytest.mark.parametrize("local", [False, True])
def test_checkpointed_matches_oracle_multitile(local):
    rng = np.random.default_rng(11)
    sm = _dna_sm()
    n, m = 2500, 1100  # 2 column strips x 2 row blocks of tiles
    text = rng.integers(0, 4, n).astype(np.int32)
    pattern = rng.integers(0, 4, m).astype(np.int32)

    score, bi, bj, at, ap, st, sp = checkpoint.checkpointed_align(
        text, pattern, sm, 4, 5, local=local,
        ckpt_cols=2048, rps=1, slots=1024,
    )
    oat, oap, ost, osp, oscore = bindings.oracle_align(
        1 if local else 0, text.astype(np.int8), pattern.astype(np.int8),
        sm, 4, 5,
    )
    assert score == oscore
    np.testing.assert_array_equal(at, oat)
    np.testing.assert_array_equal(ap, oap)
    assert (st, sp) == (ost, osp)


@pytest.mark.parametrize("gap", [1, 5])
def test_checkpointed_protein_global(gap):
    # Protein alphabet exercises the packed-plane substitution path and
    # a non-uniform matrix inside the recomputed tiles.
    from seqalign_tpu import constants
    from seqalign_tpu.io import parse_score_matrix_file

    sm_full = np.zeros((24, 24), dtype=np.int32)
    parse_score_matrix_file(
        constants.DEFAULT_PROTEIN_SCORE_MATRIX_FILE, 23, sm_full
    )
    sm = sm_full[:23, :23]
    rng = np.random.default_rng(12)
    n, m = 2600, 500
    text = rng.integers(0, 23, n).astype(np.int32)
    pattern = rng.integers(0, 23, m).astype(np.int32)

    score, _, _, at, ap, st, sp = checkpoint.checkpointed_align(
        text, pattern, sm, 23, gap, local=False,
        ckpt_cols=2048, rps=1, slots=1024,
    )
    oat, oap, ost, osp, oscore = bindings.oracle_align(
        0, text.astype(np.int8), pattern.astype(np.int8), sm, 23, gap
    )
    assert score == oscore
    np.testing.assert_array_equal(at, oat)
    np.testing.assert_array_equal(ap, oap)
    assert (st, sp) == (ost, osp)


@pytest.mark.parametrize("algo", ["--global", "--local"])
def test_checkpoint_engine_through_api(algo, monkeypatch):
    # Full Request->Response path with the checkpoint engine forced; the
    # response must be byte-identical to the CPU oracle engine.
    from seqalign_tpu.constants import Device

    from .helpers import request_from_argv, response_tuple, run

    monkeypatch.setenv("SEQALIGN_PAIR_ENGINE", "checkpoint")
    request = request_from_argv(
        "--gap-penalty", "5", algo,
        "data/dna/dna_01.txt", "data/dna/dna_02.txt",
    )
    cpu = run(request, Device.CPU)
    tpu = run(request, Device.TPU)
    assert response_tuple(cpu) == response_tuple(tpu)


def test_checkpointed_fuzz_random_shapes():
    # Randomized sizes/gaps across both algorithms, byte-compared to the
    # oracle; exercises ragged last tiles and checkpoint-column edges.
    rng = np.random.default_rng(13)
    sm = _dna_sm()
    for trial in range(4):
        n = int(rng.integers(2049, 4500))
        m = int(rng.integers(64, 1400))
        gap = int(rng.integers(1, 8))
        local = bool(trial % 2)
        text = rng.integers(0, 4, n).astype(np.int32)
        pattern = rng.integers(0, 4, m).astype(np.int32)
        score, _, _, at, ap, st, sp = checkpoint.checkpointed_align(
            text, pattern, sm, 4, gap, local=local,
            ckpt_cols=2048, rps=1, slots=1024,
        )
        oat, oap, ost, osp, oscore = bindings.oracle_align(
            1 if local else 0, text.astype(np.int8),
            pattern.astype(np.int8), sm, 4, gap,
        )
        assert score == oscore, (trial, n, m, gap, local)
        np.testing.assert_array_equal(at, oat)
        np.testing.assert_array_equal(ap, oap)
        assert (st, sp) == (ost, osp)


@pytest.mark.parametrize("local", [False, True])
def test_device_walk_matches_native(local):
    # The on-device window walker must replay exactly like the native
    # one on the same packed words, including STOP/edge handling.
    from seqalign_tpu.ops.traceback import device_walk_window, pack_words

    rng = np.random.default_rng(14)
    rows, cols = 64, 256
    # Valid direction streams only: global fills never contain STOP (a
    # STOP in global mode moves neither cursor); local may.
    hi = 4 if local else 3
    dirs_bytes = rng.integers(0, hi, (rows + 1, cols + 1)).astype(np.uint8)
    words_np = pack_words(dirs_bytes)
    row_lo, col_lo = 128, 512
    for trial in range(6):
        i = int(rng.integers(row_lo + 1, row_lo + rows + 1))
        j = int(rng.integers(col_lo + 1, col_lo + cols + 1))
        mv_n, i_n, j_n, done_n = bindings.walk_packed_window(
            words_np, row_lo, col_lo, i, j, local
        )
        out, k, i_d, j_d, done_d = device_walk_window(
            np.asarray(words_np), row_lo, col_lo, i, j, local,
            rows + cols + 1,
        )
        k = int(k)
        np.testing.assert_array_equal(
            np.asarray(out)[:k].astype(np.uint8), mv_n
        )
        assert (int(i_d), int(j_d), bool(done_d)) == (i_n, j_n, done_n)


@pytest.mark.parametrize("local", [False, True])
def test_device_walk_skewed_matches_native(local):
    # Same parity check for the wavefront kernel's skewed word format
    # (the checkpointed engine's phase-2 re-fill output).
    from seqalign_tpu.native import bindings as nb
    from seqalign_tpu.ops.traceback import (
        device_walk_skewed_window,
        pack_words_skewed,
    )

    rng = np.random.default_rng(15)
    rps, slots = 2, 128
    rows, cols = rps * slots, 300
    hi = 4 if local else 3
    dirs_bytes = rng.integers(0, hi, (rows + 1, cols + 1)).astype(np.uint8)
    words = pack_words_skewed(dirs_bytes, rps, slots)
    row_lo, col_lo = 64, 512
    for trial in range(6):
        i = int(rng.integers(row_lo + 1, row_lo + rows + 1))
        j = int(rng.integers(col_lo + 1, col_lo + cols + 1))
        mv_n, i_n, j_n, done_n = nb.walk_skewed_window(
            words, rps, slots, row_lo, col_lo, i, j, local
        )
        out, k, i_d, j_d, done_d = device_walk_skewed_window(
            np.asarray(words), rps, row_lo, col_lo, i, j, local,
            rows + cols + 1,
        )
        k = int(k)
        np.testing.assert_array_equal(
            np.asarray(out)[:k].astype(np.uint8), mv_n
        )
        assert (int(i_d), int(j_d), bool(done_d)) == (i_n, j_n, done_n)


def test_checkpointed_sw_no_match():
    # All-mismatch local alignment: best score 0, empty alignment, the
    # reference's (-1, -1) start sentinel.
    sm = np.full((4, 4), -4, dtype=np.int32)
    text = np.zeros(1100, dtype=np.int32)
    pattern = np.ones(150, dtype=np.int32)
    score, bi, bj, at, ap, st, sp = checkpoint.checkpointed_align(
        text, pattern, sm, 4, 5, local=True,
        ckpt_cols=2048, rps=1, slots=1024,
    )
    oat, oap, ost, osp, oscore = bindings.oracle_align(
        1, text.astype(np.int8), pattern.astype(np.int8), sm, 4, 5
    )
    assert score == oscore == 0
    assert at.shape[0] == oat.shape[0] == 0
    assert (st, sp) == (ost, osp)
