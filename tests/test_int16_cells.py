"""int16 cell mode of the batched score fill (interpreter mode).

The int16 kernel packs two DP cells per 32-bit VPU lane
(ops/pallas_fill.py `cell16`); it must be score-identical to the int32
kernel and the native oracle on every mode combination, and its
eligibility gate (`int16_cells_ok`) must reject any padded workload
whose DP values could reach the sentinels / wrap.
"""

import numpy as np
import pytest

from seqalign_tpu.native import bindings
from seqalign_tpu.ops import pallas_fill

jnp = pytest.importorskip("jax.numpy")


def _dna_sm():
    return np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)


def random_protein_matrix(rng: np.random.Generator, k: int) -> np.ndarray:
    sm = rng.integers(-8, 12, (k, k)).astype(np.int32)
    return ((sm + sm.T) // 2).astype(np.int32)


MODES = [
    # (local, semi, gap_extend)
    (False, False, None),
    (True, False, None),
    (False, True, None),
    (False, False, 2),
    (True, False, 2),
    (False, True, 2),
]


@pytest.mark.parametrize("local,semi,gap_extend", MODES)
def test_int16_matches_int32_dna(local, semi, gap_extend):
    rng = np.random.default_rng(7)
    sm = _dna_sm()
    b, n, m = 256, 96, 64
    texts = rng.integers(0, 4, (b, n)).astype(np.int32)
    pats = rng.integers(0, 4, (b, m)).astype(np.int32)
    ns = rng.integers(1, n + 1, b).astype(np.int32)
    ms = rng.integers(1, m + 1, b).astype(np.int32)
    assert pallas_fill.int16_cells_ok(n, m, sm, 4, 5, gap_extend)
    kw = dict(
        k_alpha=4, local=local, semi=semi, gap_extend=gap_extend,
        tile_pairs=128, interpret=True,
    )
    want = np.asarray(pallas_fill.batch_score_pallas(
        texts, pats, ns, ms, sm, 5, **kw))
    got = np.asarray(pallas_fill.batch_score_pallas(
        texts, pats, ns, ms, sm, 5, cell16=True, **kw))
    assert (got == want).all()


@pytest.mark.parametrize("local,semi,gap_extend", MODES)
def test_int16_matches_int32_protein_packed(local, semi, gap_extend):
    # k=23 exercises the 2-byte packed-plane lookup (_packed_lookup16).
    rng = np.random.default_rng(11)
    k = 23
    sm = random_protein_matrix(rng, k)
    b, n, m = 256, 80, 64
    texts = rng.integers(0, k, (b, n)).astype(np.int32)
    pats = rng.integers(0, k, (b, m)).astype(np.int32)
    ns = rng.integers(1, n + 1, b).astype(np.int32)
    ms = rng.integers(1, m + 1, b).astype(np.int32)
    gap = 10
    assert pallas_fill.int16_cells_ok(n, m, sm, k, gap, gap_extend)
    kw = dict(
        k_alpha=k, local=local, semi=semi, gap_extend=gap_extend,
        tile_pairs=128, interpret=True,
    )
    want = np.asarray(pallas_fill.batch_score_pallas(
        texts, pats, ns, ms, sm, gap, **kw))
    got = np.asarray(pallas_fill.batch_score_pallas(
        texts, pats, ns, ms, sm, gap, cell16=True, **kw))
    assert (got == want).all()


def test_int16_matches_oracle_spotcheck():
    rng = np.random.default_rng(3)
    sm = _dna_sm()
    b, n, m = 128, 64, 48
    texts = rng.integers(0, 4, (b, n)).astype(np.int32)
    pats = rng.integers(0, 4, (b, m)).astype(np.int32)
    ns = rng.integers(1, n + 1, b).astype(np.int32)
    ms = rng.integers(1, m + 1, b).astype(np.int32)
    got = np.asarray(pallas_fill.batch_score_pallas(
        texts, pats, ns, ms, sm, 5, k_alpha=4, local=True,
        tile_pairs=128, cell16=True, interpret=True,
    ))
    for i in rng.choice(b, 12, replace=False):
        want = bindings.oracle_fill(
            1, texts[i, : ns[i]].astype(np.int8),
            pats[i, : ms[i]].astype(np.int8), sm, 4, 5,
        )[1]
        assert got[i] == want


def test_int16_near_cap_exact():
    # Max-magnitude scores at shapes just inside the gate: every value
    # stays exact (the gate's whole job).
    rng = np.random.default_rng(5)
    sm = np.where(np.eye(4, dtype=bool), 127, -127).astype(np.int32)
    n, m = 48, 32  # bound = 127*32 + 127*80 = 14224 <= 15800
    assert pallas_fill.int16_cells_ok(n, m, sm, 4, 127)
    assert not pallas_fill.int16_cells_ok(64, 48, sm, 4, 127)
    texts = rng.integers(0, 4, (128, n)).astype(np.int32)
    pats = rng.integers(0, 4, (128, m)).astype(np.int32)
    ns = np.full(128, n, np.int32)
    ms = np.full(128, m, np.int32)
    kw = dict(k_alpha=4, local=False, tile_pairs=128, interpret=True)
    want = np.asarray(pallas_fill.batch_score_pallas(
        texts, pats, ns, ms, sm, 127, **kw))
    got = np.asarray(pallas_fill.batch_score_pallas(
        texts, pats, ns, ms, sm, 127, cell16=True, **kw))
    assert (got == want).all()


@pytest.mark.parametrize("local,semi,gap_extend", MODES)
def test_int16_dirs_kernel_matches_int32(local, semi, gap_extend):
    # The dirs-emitting kernel: direction words, dirs2 bitplane, best
    # cells and scores must all be bit-identical to the int32 kernel.
    rng = np.random.default_rng(13)
    sm = _dna_sm()
    b, n, m = 128, 48, 32
    texts = rng.integers(0, 4, (b, n)).astype(np.int32)
    pats = rng.integers(0, 4, (b, m)).astype(np.int32)
    ns = rng.integers(1, n + 1, b).astype(np.int32)
    ms = rng.integers(1, m + 1, b).astype(np.int32)
    kw = dict(
        k_alpha=4, local=local, semi=semi, gap_extend=gap_extend,
        tile_pairs=128, interpret=True,
    )
    want = pallas_fill.batch_fill_dirs_pallas(
        texts, pats, ns, ms, sm, 5, **kw)
    got = pallas_fill.batch_fill_dirs_pallas(
        texts, pats, ns, ms, sm, 5, cell16=True, **kw)
    names = ("scores", "best_is", "best_js", "dirs", "dirs2")
    for name, w, g in zip(names, want, got):
        if w is None:
            assert g is None
            continue
        w, g = np.asarray(w), np.asarray(g)
        assert (w == g).all(), (name, int((w != g).sum()))


def test_int16_align_via_batch_aligner(monkeypatch):
    # Full end-to-end alignments through the int16 dirs kernel must be
    # byte-identical to the int32 route.
    monkeypatch.setenv("SEQALIGN_ENGINE", "pallas_interpret")
    from seqalign_tpu.parallel.batch import BatchAligner

    rng = np.random.default_rng(17)
    sm = _dna_sm()
    texts = [rng.integers(0, 4, rng.integers(20, 90)).astype(np.int32)
             for _ in range(12)]
    pats = [rng.integers(0, 4, rng.integers(10, 60)).astype(np.int32)
            for _ in range(12)]
    aligner = BatchAligner(sm, 4, 4, local=True, gap_extend=2)
    monkeypatch.setenv("SEQALIGN_INT16_CELLS", "0")
    want = aligner.align(texts, pats)
    monkeypatch.setenv("SEQALIGN_INT16_CELLS", "auto")
    got = aligner.align(texts, pats)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (np.asarray(g.aligned_text) == np.asarray(w.aligned_text)).all()
        assert (np.asarray(g.aligned_pattern)
                == np.asarray(w.aligned_pattern)).all()
        assert g.start_in_aligned_text == w.start_in_aligned_text
        assert g.start_in_aligned_pattern == w.start_in_aligned_pattern
        assert g.score == w.score


def test_int16_routing_via_batch_aligner(monkeypatch):
    # SEQALIGN_INT16_CELLS=auto routes eligible buckets through the
    # int16 kernel inside the sharded scorer; scores must not change.
    monkeypatch.setenv("SEQALIGN_ENGINE", "pallas_interpret")
    from seqalign_tpu.parallel.batch import BatchAligner

    rng = np.random.default_rng(9)
    sm = _dna_sm()
    texts = [rng.integers(0, 4, rng.integers(20, 120)).astype(np.int32)
             for _ in range(40)]
    pats = [rng.integers(0, 4, rng.integers(10, 80)).astype(np.int32)
            for _ in range(40)]
    aligner = BatchAligner(sm, 4, 4, local=True)
    monkeypatch.setenv("SEQALIGN_INT16_CELLS", "0")
    want = aligner.score(texts, pats)
    monkeypatch.setenv("SEQALIGN_INT16_CELLS", "auto")
    got = aligner.score(texts, pats)
    assert (got == want).all()
