"""Scale tests — the reference ships these commented out with "Needs
>40GB RAM - run only on Barkla" (tests.cu:553-594); here they are
env-gated instead: run manually with a real TPU attached via

    SEQALIGN_SCALE_TESTS=1 python -m pytest tests/test_scale.py -s

(conftest skips the CPU pin when the variable is set).  Expect ~1 h:
the native oracle needs ~40 GB RAM and ~20 min per algorithm at this
size; the TPU engine under test takes seconds.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SEQALIGN_SCALE_TESTS") != "1",
    reason="set SEQALIGN_SCALE_TESTS=1 with a real TPU attached",
)


@pytest.mark.parametrize("local", [False, True])
def test_mutated_genome_pair_byte_identical(local):
    # ~211k x ~202k DNA pair (the largest bundled pair) through the
    # checkpointed engine, byte-compared against the CPU oracle.
    from seqalign_tpu.io import read_sequence_file
    from seqalign_tpu.native import bindings
    from seqalign_tpu.ops import checkpoint
    from seqalign_tpu.types import Request

    req = Request()
    assert read_sequence_file("data/dna/AbHV_ORF111.txt", req) == 0
    assert read_sequence_file("data/dna/mutated_AbHV_ORF111.txt", req) == 0
    text = np.asarray(req.text, np.int32)
    pattern = np.asarray(req.pattern, np.int32)
    if text.shape[0] < pattern.shape[0]:
        text, pattern = pattern, text
    sm = np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)

    score, _, _, at, ap, st, sp = checkpoint.checkpointed_align(
        text, pattern, sm, 4, 5, local=local
    )
    oat, oap, ost, osp, oscore = bindings.oracle_align(
        1 if local else 0, text.astype(np.int8), pattern.astype(np.int8),
        sm, 4, 5,
    )
    assert score == oscore
    np.testing.assert_array_equal(at, oat)
    np.testing.assert_array_equal(ap, oap)
    assert (st, sp) == (ost, osp)


def test_500k_local_fill_score():
    # The reference's 500k x 500k max-length demo (maxLength_quadro.out:
    # 165 s fill-only); here the wavefront score-only fill.
    from seqalign_tpu.ops import wavefront

    rng = np.random.default_rng(3)
    sm = np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)
    text = rng.integers(0, 4, 500000).astype(np.int32)
    pattern = rng.integers(0, 4, 500000).astype(np.int32)
    score, bi, bj, _, _ = wavefront.wavefront_fill(
        text, pattern, sm, 4, 5, local=True, with_dirs=False
    )
    assert score > 0 and 0 < bi <= 500000 and 0 < bj <= 500000


@pytest.mark.parametrize("local", [False, True])
def test_affine_midsize_byte_identical(local):
    # Affine (Gotoh) through the checkpointed wavefront engine on the
    # real chip, byte-compared to sa_align_affine.
    from seqalign_tpu.native import bindings
    from seqalign_tpu.ops import checkpoint

    rng = np.random.default_rng(7)
    sm = np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)
    n = int(rng.integers(35000, 60000))
    m = int(rng.integers(9000, 30000))
    t = rng.integers(0, 4, n).astype(np.int32)
    p = rng.integers(0, 4, m).astype(np.int32)
    score, _, _, at, ap, st, sp = checkpoint.checkpointed_align(
        t, p, sm, 4, 7, local=local, gap_extend=2
    )
    oat, oap, ost, osp, oscore = bindings.oracle_align_affine(
        1 if local else 0, t.astype(np.int8), p.astype(np.int8), sm, 4, 7, 2
    )
    assert score == oscore
    np.testing.assert_array_equal(at, oat)
    np.testing.assert_array_equal(ap, oap)
    assert (st, sp) == (ost, osp)


@pytest.mark.parametrize("algo_kw", [{}, {"local": True}, {"semi": True}])
def test_random_midsize_byte_identical(algo_kw):
    # Randomized ~35-70k pairs through the checkpointed engine on the
    # real chip, byte-compared to the oracle (all three algorithms).
    from seqalign_tpu.native import bindings
    from seqalign_tpu.ops import checkpoint

    rng = np.random.default_rng(99)
    sm = np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)
    n = int(rng.integers(35000, 70000))
    m = int(rng.integers(9000, min(n, 45000)))
    gap = int(rng.integers(1, 8))
    t = rng.integers(0, 4, n).astype(np.int32)
    p = rng.integers(0, 4, m).astype(np.int32)
    algo = 1 if algo_kw.get("local") else (2 if algo_kw.get("semi") else 0)
    score, _, _, at, ap, st, sp = checkpoint.checkpointed_align(
        t, p, sm, 4, gap, **algo_kw
    )
    oat, oap, ost, osp, oscore = bindings.oracle_align(
        algo, t.astype(np.int8), p.astype(np.int8), sm, 4, gap
    )
    assert score == oscore
    np.testing.assert_array_equal(at, oat)
    np.testing.assert_array_equal(ap, oap)
    assert (st, sp) == (ost, osp)
