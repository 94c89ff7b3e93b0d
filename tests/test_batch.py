"""Batch engine + multi-device sharding tests (8 virtual CPU devices)."""

import jax
import numpy as np
import pytest

from seqalign_tpu import constants
from seqalign_tpu.io import parse_score_matrix_file
from seqalign_tpu.native import bindings
from seqalign_tpu.ops import scan_engine
from seqalign_tpu.ops.batch import batch_score
from seqalign_tpu.parallel import mesh as mesh_lib
from seqalign_tpu.parallel.batch import BatchAligner
from seqalign_tpu.types import Request


def _dna_matrix():
    request = Request()
    parse_score_matrix_file(
        "scoreMatrices/dna/blast.txt", request.alphabet_size, request.score_matrix
    )
    return np.asarray(request.score_matrix[:4, :4], dtype=np.int32)


def _random_pairs(rng, count, max_len=200):
    texts, patterns = [], []
    for _ in range(count):
        n = int(rng.integers(1, max_len))
        m = int(rng.integers(1, max_len))
        n, m = max(n, m), min(n, m)
        texts.append(rng.integers(0, 4, n).astype(np.int32))
        patterns.append(rng.integers(0, 4, m).astype(np.int32))
    return texts, patterns


def _oracle_scores(texts, patterns, sm, gap, algo):
    out = []
    for t, p in zip(texts, patterns):
        _, score, _ = bindings.oracle_fill(
            algo, t.astype(np.int8), p.astype(np.int8), sm, 4, gap
        )
        out.append(score)
    return np.array(out, dtype=np.int32)


@pytest.mark.parametrize("local", [False, True])
def test_batch_score_matches_oracle(local):
    rng = np.random.default_rng(3)
    sm = _dna_matrix()
    texts, patterns = _random_pairs(rng, 12, max_len=120)
    n_pad = max(scan_engine.padded_width(len(t)) - 1 for t in texts)
    m_pad = max(scan_engine.padded_rows(len(p)) for p in patterns)
    t_arr = np.zeros((12, n_pad), np.int32)
    p_arr = np.zeros((12, m_pad), np.int32)
    ns = np.array([len(t) for t in texts], np.int32)
    ms = np.array([len(p) for p in patterns], np.int32)
    for i, (t, p) in enumerate(zip(texts, patterns)):
        t_arr[i, : len(t)] = t
        p_arr[i, : len(p)] = p

    got = np.asarray(
        batch_score(t_arr, p_arr, ns, ms, sm, 5, local=local)
    )
    want = _oracle_scores(texts, patterns, sm, 5, 1 if local else 0)
    np.testing.assert_array_equal(got, want)


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("local", [False, True])
def test_sharded_batch_aligner_matches_oracle(local):
    rng = np.random.default_rng(11)
    sm = _dna_matrix()
    texts, patterns = _random_pairs(rng, 37, max_len=250)
    aligner = BatchAligner(sm, 4, gap_penalty=5, local=local)
    assert aligner.mesh.size == 8
    got = aligner.score(texts, patterns)
    want = _oracle_scores(texts, patterns, sm, 5, 1 if local else 0)
    np.testing.assert_array_equal(got, want)


def test_batch_aligner_swaps_shorter_text():
    sm = _dna_matrix()
    rng = np.random.default_rng(5)
    text = rng.integers(0, 4, 50).astype(np.int32)
    pattern = rng.integers(0, 4, 150).astype(np.int32)  # longer than text
    aligner = BatchAligner(sm, 4, gap_penalty=5, local=False)
    got = aligner.score([text], [pattern])
    want = _oracle_scores([pattern], [text], sm, 5, 0)
    np.testing.assert_array_equal(got, want)


def test_batch_aligner_empty_pairs_match_oracle():
    # Empty texts/patterns bypass the device fill (whose masking assumes
    # n, m >= 1 — e.g. the affine-semi last-row mask never fires at
    # n == 0) and come from the oracle, for every mode combination.
    from seqalign_tpu.native import bindings

    sm = _dna_matrix()
    rng = np.random.default_rng(7)
    seq = rng.integers(0, 4, 30).astype(np.int32)
    empty = np.array([], dtype=np.int32)
    texts = [empty, seq, empty]
    patterns = [seq, empty, empty]
    for mode in ({}, {"local": True}, {"semi": True},
                 {"gap_extend": 2}, {"semi": True, "gap_extend": 2}):
        aligner = BatchAligner(sm, 4, gap_penalty=5, **mode)
        got = aligner.score(texts, patterns, swap=False)
        algo = 2 if mode.get("semi") else (1 if mode.get("local") else 0)
        for i, (t, p) in enumerate(zip(texts, patterns)):
            if "gap_extend" in mode:
                want, _ = bindings.oracle_fill_affine(
                    algo, t.astype(np.int8), p.astype(np.int8), sm, 4,
                    5, mode["gap_extend"],
                )
            else:
                _, want, _ = bindings.oracle_fill(
                    algo, t.astype(np.int8), p.astype(np.int8), sm, 4, 5
                )
            assert int(got[i]) == int(want), (mode, i)
        results = aligner.align(texts, patterns)
        for i, (t, p) in enumerate(zip(texts, patterns)):
            if "gap_extend" in mode:
                at, ap, st, sp, sc = bindings.oracle_align_affine(
                    algo, t.astype(np.int8), p.astype(np.int8), sm, 4,
                    5, mode["gap_extend"],
                )
            else:
                at, ap, st, sp, sc = bindings.oracle_align(
                    algo, t.astype(np.int8), p.astype(np.int8), sm, 4, 5
                )
            assert results[i].score == sc, (mode, i)
            np.testing.assert_array_equal(results[i].aligned_text, at)
            np.testing.assert_array_equal(results[i].aligned_pattern, ap)


def test_batch_aligner_score_swap_false_matches_align_orientation():
    # swap=False scores pairs exactly as given — the orientation align()
    # uses — so mixed score()/align() callers agree even when the
    # pattern is longer than the text (semi-global, where orientation
    # decides which sequence gets the free end-gaps).
    sm = _dna_matrix()
    rng = np.random.default_rng(6)
    texts = [rng.integers(0, 4, 40).astype(np.int32) for _ in range(3)]
    patterns = [rng.integers(0, 4, 90).astype(np.int32) for _ in range(3)]
    aligner = BatchAligner(sm, 4, gap_penalty=5, semi=True)
    got = aligner.score(texts, patterns, swap=False)
    want = _oracle_scores(texts, patterns, sm, 5, 2)
    np.testing.assert_array_equal(got, want)
    # Default swap orientation fits the shorter sequence instead.
    swapped = aligner.score(texts, patterns)
    want_swapped = _oracle_scores(patterns, texts, sm, 5, 2)
    np.testing.assert_array_equal(swapped, want_swapped)
