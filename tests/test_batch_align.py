"""Batched end-to-end alignment (fill + device traceback) vs the oracle.

The reference's batch benchmark loops full alignments one request at a
time (tests/benchmarks.cu:271-332); BatchAligner.align() runs a whole
padded batch in two dispatches and must stay byte-identical to the CPU
oracle on every pair.
"""

import numpy as np
import pytest

from seqalign_tpu.native import bindings
from seqalign_tpu.parallel.batch import BatchAligner


def _dna_sm():
    return np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("SEQALIGN_ENGINE", "pallas_interpret")


def _random_pairs(rng, count, n_hi=48, m_hi=40):
    texts, patterns = [], []
    for _ in range(count):
        texts.append(
            rng.integers(0, 4, int(rng.integers(4, n_hi))).astype(np.int32)
        )
        patterns.append(
            rng.integers(0, 4, int(rng.integers(3, m_hi))).astype(np.int32)
        )
    return texts, patterns


@pytest.mark.parametrize(
    "mode", [{}, {"local": True}, {"semi": True}]
)
def test_batch_align_matches_oracle(mode):
    rng = np.random.default_rng(21)
    sm = _dna_sm()
    texts, patterns = _random_pairs(rng, 12)
    if mode.get("semi"):
        # Semi-global fits the pattern into the text: keep pattern shorter.
        texts = [np.concatenate([t, t]) for t in texts]
    aligner = BatchAligner(sm, 4, 5, **mode)
    results = aligner.align(texts, patterns)
    algo = 2 if mode.get("semi") else (1 if mode.get("local") else 0)
    for t, p, r in zip(texts, patterns, results):
        oat, oap, ost, osp, oscore = bindings.oracle_align(
            algo, t.astype(np.int8), p.astype(np.int8), sm, 4, 5
        )
        assert r.score == oscore, (t.shape, p.shape)
        np.testing.assert_array_equal(r.aligned_text, oat)
        np.testing.assert_array_equal(r.aligned_pattern, oap)
        assert (r.start_in_aligned_text, r.start_in_aligned_pattern) == (
            ost, osp,
        )


def test_batch_align_protein_and_gap_grid():
    # Protein alphabet (packed substitution planes) across gap penalties.
    from seqalign_tpu import constants
    from seqalign_tpu.io import parse_score_matrix_file

    sm_full = np.zeros((24, 24), dtype=np.int32)
    parse_score_matrix_file(
        constants.DEFAULT_PROTEIN_SCORE_MATRIX_FILE, 23, sm_full
    )
    sm = sm_full[:23, :23]
    rng = np.random.default_rng(22)
    texts, patterns = [], []
    for _ in range(6):
        texts.append(
            rng.integers(0, 23, int(rng.integers(8, 40))).astype(np.int32)
        )
        patterns.append(
            rng.integers(0, 23, int(rng.integers(5, 36))).astype(np.int32)
        )
    for gap, local in ((1, False), (7, True)):
        aligner = BatchAligner(sm, 23, gap, local=local)
        results = aligner.align(texts, patterns)
        for t, p, r in zip(texts, patterns, results):
            oat, oap, ost, osp, oscore = bindings.oracle_align(
                1 if local else 0, t.astype(np.int8), p.astype(np.int8),
                sm, 23, gap,
            )
            assert r.score == oscore
            np.testing.assert_array_equal(r.aligned_text, oat)
            np.testing.assert_array_equal(r.aligned_pattern, oap)
            assert (
                r.start_in_aligned_text, r.start_in_aligned_pattern
            ) == (ost, osp)


@pytest.mark.parametrize("mode", [{}, {"local": True}, {"semi": True}])
def test_batch_align_affine_matches_oracle(mode):
    # Affine (Gotoh) batched end-to-end: dirs + continuation bitplane +
    # three-state lockstep walk vs sa_align_affine, per pair — all three
    # algorithms (semi+affine is the round-3 combination).
    rng = np.random.default_rng(25)
    sm = _dna_sm()
    texts, patterns = _random_pairs(rng, 10)
    if mode.get("semi"):
        texts = [np.concatenate([t, t]) for t in texts]
    aligner = BatchAligner(sm, 4, 6, gap_extend=2, **mode)
    results = aligner.align(texts, patterns)
    algo = 2 if mode.get("semi") else (1 if mode.get("local") else 0)
    for t, p, r in zip(texts, patterns, results):
        oat, oap, ost, osp, oscore = bindings.oracle_align_affine(
            algo, t.astype(np.int8), p.astype(np.int8),
            sm, 4, 6, 2,
        )
        assert r.score == oscore, (t.shape, p.shape)
        np.testing.assert_array_equal(r.aligned_text, oat)
        np.testing.assert_array_equal(r.aligned_pattern, oap)
        assert (r.start_in_aligned_text, r.start_in_aligned_pattern) == (
            ost, osp,
        )


def test_batch_align_sw_no_match():
    # All-mismatch local pairs: score 0, empty alignment, (-1, -1).
    sm = np.full((4, 4), -4, dtype=np.int32)
    texts = [np.zeros(20, np.int32), np.zeros(7, np.int32)]
    patterns = [np.ones(9, np.int32), np.ones(5, np.int32)]
    aligner = BatchAligner(sm, 4, 5, local=True)
    results = aligner.align(texts, patterns)
    for t, p, r in zip(texts, patterns, results):
        oat, oap, ost, osp, oscore = bindings.oracle_align(
            1, t.astype(np.int8), p.astype(np.int8), sm, 4, 5
        )
        assert r.score == oscore == 0
        assert r.aligned_text.shape[0] == 0
        assert (r.start_in_aligned_text, r.start_in_aligned_pattern) == (
            ost, osp,
        )


def test_batch_align_bucket_quantization():
    # Ragged 100-400nt pairs must collapse into a handful of 128-quantized
    # shape buckets (each distinct shape is its own Mosaic compile and its
    # own 128-pair-padded dispatch on hardware) — the round-4 on-chip
    # parity probe shattered 64 pairs into 60 single-pair buckets at the
    # old 16-granularity.  Parity with the oracle must survive the extra
    # shape padding.
    rng = np.random.default_rng(31)
    sm = _dna_sm()
    texts = [
        rng.integers(0, 4, int(rng.integers(100, 400))).astype(np.int32)
        for _ in range(24)
    ]
    patterns = [
        rng.integers(0, 4, int(rng.integers(80, 380))).astype(np.int32)
        for _ in range(24)
    ]
    shapes = {
        (max(128, -(-len(t) // 128) * 128), max(128, -(-len(p) // 128) * 128))
        for t, p in zip(texts, patterns)
    }
    assert len(shapes) <= 12
    assert all(n % 128 == 0 and m % 128 == 0 for n, m in shapes)
    results = BatchAligner(sm, 4, 5).align(texts, patterns)
    for t, p, r in zip(texts, patterns, results):
        oat, oap, ost, osp, oscore = bindings.oracle_align(
            0, t.astype(np.int8), p.astype(np.int8), sm, 4, 5
        )
        assert r.score == oscore
        np.testing.assert_array_equal(r.aligned_text, oat)
        np.testing.assert_array_equal(r.aligned_pattern, oap)
        assert (r.start_in_aligned_text, r.start_in_aligned_pattern) == (
            ost, osp,
        )


def test_batch_align_multigroup_walk(monkeypatch):
    # Force the int32-index chunking: several tiles per shard, walked in
    # separate groups, must reassemble into identical results.  This
    # targets the LOCKSTEP walk's chunk arithmetic, so pin that route
    # (the per-pair walker has its own tests below).
    from seqalign_tpu.parallel import batch as batch_mod

    monkeypatch.setattr(batch_mod, "WALK_INDEX_CAP", 1)
    monkeypatch.setenv("SEQALIGN_BATCH_WALKER_MAX_PAIRS", "0")
    rng = np.random.default_rng(27)
    sm = _dna_sm()
    texts, patterns = _random_pairs(rng, 2050, n_hi=14, m_hi=12)
    results = BatchAligner(sm, 4, 3).align(texts, patterns)
    for t, p, r in zip(texts[::97], patterns[::97], results[::97]):
        oat, oap, ost, osp, oscore = bindings.oracle_align(
            0, t.astype(np.int8), p.astype(np.int8), sm, 4, 3
        )
        assert r.score == oscore
        np.testing.assert_array_equal(r.aligned_text, oat)
        assert (r.start_in_aligned_text, r.start_in_aligned_pattern) == (
            ost, osp,
        )


def test_batch_align_pipeline_chunks(monkeypatch):
    # Force several pipeline chunks so the threaded collect path (async
    # D2H prefetch + worker-thread emit one chunk behind) runs in CI:
    # with the default 16384-pair chunk every CI-sized batch is a single
    # chunk and the overlap machinery would only ever execute on
    # hardware.  Results must land in the caller's order regardless of
    # which thread emitted them.
    monkeypatch.setattr(
        BatchAligner, "_dirs_tile_pairs", lambda self, *a: 128
    )
    monkeypatch.setenv("SEQALIGN_BATCH_PIPELINE_PAIRS", "1")
    rng = np.random.default_rng(41)
    sm = _dna_sm()
    texts, patterns = _random_pairs(rng, 2080, n_hi=14, m_hi=12)
    aligner = BatchAligner(sm, 4, 3, local=True)
    # 128-pair tiles on the 8-device mesh -> 1024-pair chunks -> 3
    # chunks (1024 + 1024 + 32-padded tail).
    results = aligner.align(texts, patterns)
    for t, p, r in zip(texts[::83], patterns[::83], results[::83]):
        oat, oap, ost, osp, oscore = bindings.oracle_align(
            1, t.astype(np.int8), p.astype(np.int8), sm, 4, 3
        )
        assert r.score == oscore
        np.testing.assert_array_equal(r.aligned_text, oat)
        np.testing.assert_array_equal(r.aligned_pattern, oap)
        assert (r.start_in_aligned_text, r.start_in_aligned_pattern) == (
            ost, osp,
        )


@pytest.mark.parametrize(
    "mode",
    [{}, {"local": True}, {"semi": True}, {"gap_extend": 2},
     {"semi": True, "gap_extend": 2}],
)
def test_batch_pallas_walker_matches_lockstep(mode, monkeypatch):
    # The per-pair in-kernel walker must produce byte-identical
    # alignments to the lockstep walk on the same fills (both are pinned
    # to the oracle elsewhere; this pins them to each other across the
    # window-reload path, long pairs included).
    rng = np.random.default_rng(29)
    sm = _dna_sm()
    gap = 6 if "gap_extend" in mode else 5
    texts, patterns = _random_pairs(rng, 5, n_hi=200, m_hi=180)
    if mode.get("semi"):
        texts = [np.concatenate([t, t]) for t in texts]

    monkeypatch.setenv("SEQALIGN_BATCH_WALKER_MAX_PAIRS", "4096")
    via_walker = BatchAligner(sm, 4, gap, **mode).align(texts, patterns)
    monkeypatch.setenv("SEQALIGN_BATCH_WALKER_MAX_PAIRS", "0")
    via_lockstep = BatchAligner(sm, 4, gap, **mode).align(texts, patterns)
    for a, b in zip(via_walker, via_lockstep):
        assert a.score == b.score
        np.testing.assert_array_equal(a.aligned_text, b.aligned_text)
        np.testing.assert_array_equal(a.aligned_pattern, b.aligned_pattern)
        assert (a.start_in_aligned_text, a.start_in_aligned_pattern) == (
            b.start_in_aligned_text, b.start_in_aligned_pattern,
        )


def test_batch_align_xla_fallback(monkeypatch):
    # Engine forced off Pallas: align() falls back to the oracle per pair.
    monkeypatch.setenv("SEQALIGN_ENGINE", "xla")
    rng = np.random.default_rng(23)
    sm = _dna_sm()
    texts, patterns = _random_pairs(rng, 3)
    results = BatchAligner(sm, 4, 5).align(texts, patterns)
    for t, p, r in zip(texts, patterns, results):
        oat, oap, _, _, oscore = bindings.oracle_align(
            0, t.astype(np.int8), p.astype(np.int8), sm, 4, 5
        )
        assert r.score == oscore
        np.testing.assert_array_equal(r.aligned_text, oat)


def test_emit_moves_batch_matches_per_pair_emitters():
    # The one-call native bucket emitter must replay move lists exactly
    # like the per-pair paths it replaced: sa_emit_moves (mode 0 global
    # / 1 local, incl. the SW early-exit cursor quirk) and the affine
    # numpy replay (mode 2).  Random move lists stress every branch.
    from seqalign_tpu.ops.traceback import emit_moves_affine

    rng = np.random.default_rng(11)
    b = 33
    n_pad, m_pad = 64, 48
    max_len = 128  # multiple of 16
    words = max_len // 16
    texts = rng.integers(0, 4, (b, n_pad)).astype(np.int8)
    patterns = rng.integers(0, 4, (b, m_pad)).astype(np.int8)
    for mode in (0, 1, 2):
        # Accumulate in uint32 (a TOP move in the top slot sets bit 31)
        # and reinterpret to the walkers' int32 word dtype at the end.
        packed = np.zeros((b, words), dtype=np.uint32)
        lens = np.zeros(b, dtype=np.int32)
        start_is = np.zeros(b, dtype=np.int32)
        start_js = np.zeros(b, dtype=np.int32)
        mvs = []
        for r in range(b):
            ln = int(rng.integers(0, max_len))
            si = int(rng.integers(1, m_pad + 1))
            sj = int(rng.integers(1, n_pad + 1))
            mv = rng.integers(0, 3, ln).astype(np.uint8)  # LEFT/DIAG/TOP
            if mode == 1 and ln:
                # Keep the walk inside the matrix like a real SW list:
                # truncate at the first move that exhausts a cursor.
                i, j = si, sj
                for p2 in range(ln):
                    d = mv[p2]
                    if d in (1, 0):
                        j -= 1
                    if d in (1, 2):
                        i -= 1
                    if i == 0 or j == 0:
                        mv = mv[: p2 + 1]
                        break
                ln = len(mv)
            lens[r], start_is[r], start_js[r] = ln, si, sj
            for p2, d in enumerate(mv):
                packed[r, p2 // 16] |= np.uint32(int(d) << (2 * (p2 % 16)))
            mvs.append(mv)
        at_all, ap_all, st_all, sp_all = bindings.emit_moves_batch(
            packed.view(np.int32), lens, start_is, start_js, mode,
            texts, patterns, 4,
        )
        for r in range(b):
            if mode == 2:
                eat, eap, est, esp = emit_moves_affine(
                    mvs[r], int(start_is[r]), int(start_js[r]),
                    texts[r], patterns[r], 4,
                )
            else:
                eat, eap, est, esp = bindings.emit_moves(
                    mvs[r], int(start_is[r]), int(start_js[r]),
                    mode == 1, texts[r], patterns[r], 4,
                )
            ln = lens[r]
            np.testing.assert_array_equal(at_all[r, :ln], eat)
            np.testing.assert_array_equal(ap_all[r, :ln], eap)
            assert (st_all[r], sp_all[r]) == (est, esp)
