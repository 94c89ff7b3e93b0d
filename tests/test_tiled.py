"""Tiled long-sequence engine tests (interpreter mode, small shapes with
tiny strips/blocks to force multi-strip + multi-block paths)."""

import numpy as np
import pytest

from seqalign_tpu.native import bindings
from seqalign_tpu.ops import tiled


def _dna_sm():
    return np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)


@pytest.fixture(autouse=True, scope="module")
def _fresh_caches():
    # Compiling this file's interpret-mode strip programs after the full
    # suite's ~200 tests of accumulated executables segfaults inside
    # XLA:CPU backend_compile (deterministic at multistrip[True]; the
    # file alone passes, and every <=150-test subset passes).  Dropping
    # the in-process jit caches before the file dodges the poisoned
    # compiler state; see bench/results/r5_suite_segfault_notes.md.
    import jax

    jax.clear_caches()


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("SEQALIGN_ENGINE", "pallas_interpret")


@pytest.mark.parametrize("local", [False, True])
def test_tiled_matches_oracle_multistrip(local):
    rng = np.random.default_rng(7)
    sm = _dna_sm()
    n, m = 2500, 300  # 3 strips of 1024, 3 row blocks of 128
    text = rng.integers(0, 4, n).astype(np.int32)
    pattern = rng.integers(0, 4, m).astype(np.int32)

    result = tiled.tiled_fill(
        text, pattern, sm, 4, 5, local=local,
        strip_cols=1024, block_rows=128,
    )
    odirs, oscore, obest = bindings.oracle_fill(
        1 if local else 0, text.astype(np.int8), pattern.astype(np.int8),
        sm, 4, 5,
    )
    assert result.score == oscore
    if local:
        assert (result.best_i, result.best_j) == (
            obest // (n + 1), obest % (n + 1)
        )

    # Direction words bit-identical across strip boundaries.
    rows = np.arange(1, m + 1)
    w = result.words[(rows - 1) // 16]
    got = (w >> (2 * ((rows - 1) % 16))[:, None]) & 3
    np.testing.assert_array_equal(got[:, :n], odirs[1:, 1:])

    # Full alignment through the packed traceback.
    at, ap, st, sp = bindings.traceback_packed(
        1 if local else 0, result.words, text, pattern, 4,
        best_i=result.best_i, best_j=result.best_j,
    )
    oat, oap, ost, osp, oscore2 = bindings.oracle_align(
        1 if local else 0, text.astype(np.int8), pattern.astype(np.int8),
        sm, 4, 5,
    )
    np.testing.assert_array_equal(at, oat)
    np.testing.assert_array_equal(ap, oap)
    assert (st, sp) == (ost, osp)


@pytest.mark.parametrize("local", [False, True])
def test_tiled_score_only(local):
    rng = np.random.default_rng(8)
    sm = _dna_sm()
    n, m = 1500, 200
    text = rng.integers(0, 4, n).astype(np.int32)
    pattern = rng.integers(0, 4, m).astype(np.int32)
    score = tiled.tiled_fill_score(
        text, pattern, sm, 4, 5, local=local, strip_cols=1024
    )
    _, oscore, _ = bindings.oracle_fill(
        1 if local else 0, text.astype(np.int8), pattern.astype(np.int8),
        sm, 4, 5,
    )
    assert score == oscore


def test_sw_best_cell_row_major_across_strips():
    # Construct a tie: the same max score reachable in strip 1 at an
    # earlier row than in strip 0; row-major semantics must pick the
    # earlier row even though strip 0 is processed first.
    sm = _dna_sm()
    #         strip0 (cols 1..1024)      strip1 (cols 1025..)
    text = np.zeros(1100, dtype=np.int32)
    text[:] = 3  # G everywhere (mismatch vs A/T)
    # 'ATC' at columns 1060..1062 (strip 1), and at columns 10..12 (strip 0)
    text[1059:1062] = [0, 1, 2]
    text[9:12] = [0, 1, 2]
    pattern = np.zeros(160, dtype=np.int32)
    pattern[:] = 3
    pattern[4:7] = [0, 1, 2]    # row 5..7 match -> hits both text sites
    result = tiled.tiled_fill(
        text, pattern, sm, 4, 5, local=True, strip_cols=1024, block_rows=128
    )
    _, oscore, obest = bindings.oracle_fill(
        1, text.astype(np.int8), pattern.astype(np.int8), sm, 4, 5
    )
    assert result.score == oscore
    assert (result.best_i, result.best_j) == (
        obest // (text.shape[0] + 1), obest % (text.shape[0] + 1)
    )
