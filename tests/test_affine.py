"""Affine-gap (Gotoh) scoring tests — an extension beyond the linear-gap
reference; the native oracle (validated against a brute-force DP) is the
contract.  A gap run of length L costs open + (L-1)*extend, so
open == extend must reproduce the linear engine exactly."""

import numpy as np
import pytest

from seqalign_tpu.native import bindings


def _dna_sm():
    return np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)


def _brute(text, pattern, sm, open_, ext, local):
    neg = -(10**9)
    n, m = len(text), len(pattern)
    big_h = np.zeros((m + 1, n + 1), np.int64)
    big_e = np.full((m + 1, n + 1), neg, np.int64)
    big_f = np.full((m + 1, n + 1), neg, np.int64)
    if not local:
        for j in range(1, n + 1):
            big_h[0, j] = -open_ - (j - 1) * ext
        for i in range(1, m + 1):
            big_h[i, 0] = -open_ - (i - 1) * ext
    best = 0
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            big_e[i, j] = max(big_e[i, j - 1] - ext, big_h[i, j - 1] - open_)
            big_f[i, j] = max(big_f[i - 1, j] - ext, big_h[i - 1, j] - open_)
            h = max(
                big_h[i - 1, j - 1] + sm[pattern[i - 1], text[j - 1]],
                big_e[i, j],
                big_f[i, j],
            )
            if local:
                h = max(h, 0)
                best = max(best, h)
            big_h[i, j] = h
    return best if local else big_h[m, n]


def test_oracle_affine_vs_brute_force():
    rng = np.random.default_rng(31)
    sm = _dna_sm()
    for trial in range(10):
        n, m = int(rng.integers(3, 70)), int(rng.integers(3, 70))
        open_, ext = int(rng.integers(1, 12)), int(rng.integers(1, 12))
        local = bool(trial % 2)
        t = rng.integers(0, 4, n).astype(np.int8)
        p = rng.integers(0, 4, m).astype(np.int8)
        got, _ = bindings.oracle_fill_affine(
            1 if local else 0, t, p, sm, 4, open_, ext
        )
        assert got == _brute(t, p, sm, open_, ext, local)


def test_oracle_affine_linear_degeneracy():
    rng = np.random.default_rng(32)
    sm = _dna_sm()
    for local in (False, True):
        for g in (1, 5, 9):
            n, m = 120, 90
            t = rng.integers(0, 4, n).astype(np.int8)
            p = rng.integers(0, 4, m).astype(np.int8)
            aff, _ = bindings.oracle_fill_affine(
                1 if local else 0, t, p, sm, 4, g, g
            )
            _, lin, _ = bindings.oracle_fill(1 if local else 0, t, p, sm, 4, g)
            assert aff == lin


@pytest.mark.parametrize("local", [False, True])
def test_scan_engine_affine_vs_oracle(local):
    import jax.numpy as jnp

    from seqalign_tpu.ops import scan_engine

    rng = np.random.default_rng(33)
    sm = _dna_sm()
    for trial in range(4):
        n, m = int(rng.integers(10, 400)), int(rng.integers(10, 300))
        ext = int(rng.integers(1, 6))
        open_ = ext + int(rng.integers(0, 9))  # prefix-max needs open >= ext
        t = rng.integers(0, 4, n).astype(np.int32)
        p = rng.integers(0, 4, m).astype(np.int32)
        width = scan_engine.padded_width(n)
        prof = scan_engine.build_profile(jnp.asarray(t), jnp.asarray(sm), width)
        pat = jnp.asarray(
            scan_engine.pad_pattern(p, scan_engine.padded_rows(m))
        )
        got, bidx = scan_engine.affine_score_fill(
            prof, pat, open_, ext, n, m, local=local
        )
        want, obest = bindings.oracle_fill_affine(
            1 if local else 0, t.astype(np.int8), p.astype(np.int8),
            sm, 4, open_, ext,
        )
        assert int(got) == want
        if local and want > 0:
            assert (int(bidx) // width, int(bidx) % width) == (
                obest // (n + 1), obest % (n + 1)
            )


@pytest.mark.parametrize("local", [False, True])
def test_pallas_batch_affine_vs_oracle(local, monkeypatch):
    import jax
    import jax.numpy as jnp

    from seqalign_tpu.ops.pallas_fill import batch_score_pallas

    rng = np.random.default_rng(34)
    sm = _dna_sm()
    b, n, m = 128, 96, 64
    texts = rng.integers(0, 4, (b, n)).astype(np.int32)
    patterns = rng.integers(0, 4, (b, m)).astype(np.int32)
    ns = rng.integers(n // 2, n + 1, b).astype(np.int32)
    ms = rng.integers(m // 2, m + 1, b).astype(np.int32)
    open_, ext = 7, 2
    out = np.asarray(jax.device_get(batch_score_pallas(
        jnp.asarray(texts), jnp.asarray(patterns), jnp.asarray(ns),
        jnp.asarray(ms), jnp.asarray(sm), open_,
        k_alpha=4, local=local, gap_extend=ext, interpret=True,
    )))
    for idx in rng.integers(0, b, 12):
        want, _ = bindings.oracle_fill_affine(
            1 if local else 0,
            texts[idx, : ns[idx]].astype(np.int8),
            patterns[idx, : ms[idx]].astype(np.int8),
            sm, 4, open_, ext,
        )
        assert out[idx] == want, int(idx)


def test_pallas_batch_affine_protein():
    # Protein alphabet: affine recurrence composed with the packed-byte
    # substitution planes.
    import jax
    import jax.numpy as jnp

    from seqalign_tpu import constants
    from seqalign_tpu.io import parse_score_matrix_file
    from seqalign_tpu.ops.pallas_fill import batch_score_pallas

    sm_full = np.zeros((24, 24), dtype=np.int32)
    parse_score_matrix_file(
        constants.DEFAULT_PROTEIN_SCORE_MATRIX_FILE, 23, sm_full
    )
    sm = sm_full[:23, :23]
    rng = np.random.default_rng(38)
    b, n, m = 128, 96, 64
    texts = rng.integers(0, 23, (b, n)).astype(np.int32)
    patterns = rng.integers(0, 23, (b, m)).astype(np.int32)
    ns = np.full(b, n, np.int32)
    ms = np.full(b, m, np.int32)
    out = np.asarray(jax.device_get(batch_score_pallas(
        jnp.asarray(texts), jnp.asarray(patterns), jnp.asarray(ns),
        jnp.asarray(ms), jnp.asarray(sm), 11,
        k_alpha=23, local=True, gap_extend=1, interpret=True,
    )))
    for idx in rng.integers(0, b, 8):
        want, _ = bindings.oracle_fill_affine(
            1, texts[idx].astype(np.int8), patterns[idx].astype(np.int8),
            sm, 23, 11, 1,
        )
        assert out[idx] == want, int(idx)


def _affine_path_score(at, ap, sm, open_, ext, gap_idx=4):
    """Re-score an emitted alignment under affine gap costs."""
    score = 0
    run_t = run_p = 0
    for a, b in zip(at.tolist(), ap.tolist()):
        if a == gap_idx:
            score -= open_ if run_t == 0 else ext
            run_t += 1
            run_p = 0
        elif b == gap_idx:
            score -= open_ if run_p == 0 else ext
            run_p += 1
            run_t = 0
        else:
            score += int(sm[b, a])
            run_t = run_p = 0
    return score


@pytest.mark.parametrize("local", [False, True])
def test_oracle_affine_traceback(local):
    # The emitted alignment must re-score to the optimal affine score,
    # and its non-gap characters must reconstruct the claimed subsequence
    # windows of the inputs (a valid optimal path, independent of which
    # optimum the tie policy picks).
    rng = np.random.default_rng(37)
    sm = _dna_sm()
    for trial in range(8):
        n, m = int(rng.integers(10, 150)), int(rng.integers(10, 150))
        ext = int(rng.integers(1, 5))
        open_ = ext + int(rng.integers(0, 8))
        t = rng.integers(0, 4, n).astype(np.int8)
        p = rng.integers(0, 4, m).astype(np.int8)
        at, ap, st, sp, score = bindings.oracle_align_affine(
            1 if local else 0, t, p, sm, 4, open_, ext
        )
        want, _ = bindings.oracle_fill_affine(
            1 if local else 0, t, p, sm, 4, open_, ext
        )
        assert score == want
        assert _affine_path_score(at, ap, sm, open_, ext) == want
        t_sub = at[at != 4]
        p_sub = ap[ap != 4]
        if local:
            np.testing.assert_array_equal(
                t_sub, t[st : st + t_sub.shape[0]].astype(np.uint8)
            )
            np.testing.assert_array_equal(
                p_sub, p[sp : sp + p_sub.shape[0]].astype(np.uint8)
            )
        else:
            assert (st, sp) == (0, 0)
            np.testing.assert_array_equal(t_sub, t.astype(np.uint8))
            np.testing.assert_array_equal(p_sub, p.astype(np.uint8))


def test_batch_aligner_affine():
    # Public API path on the virtual CPU mesh (XLA engine).
    from seqalign_tpu.parallel.batch import BatchAligner

    rng = np.random.default_rng(35)
    sm = _dna_sm()
    texts = [rng.integers(0, 4, int(rng.integers(20, 120))) for _ in range(9)]
    pats = [rng.integers(0, 4, int(rng.integers(20, 120))) for _ in range(9)]
    aligner = BatchAligner(sm, 4, gap_penalty=6, gap_extend=2, local=True)
    scores = aligner.score(texts, pats)
    for i in range(9):
        t, p = texts[i], pats[i]
        if t.shape[0] < p.shape[0]:
            t, p = p, t
        want, _ = bindings.oracle_fill_affine(
            1, t.astype(np.int8), p.astype(np.int8), sm, 4, 6, 2
        )
        assert scores[i] == want, i

    with pytest.raises(ValueError):
        BatchAligner(sm, 4, gap_penalty=1, gap_extend=2)


def test_affine_cli(monkeypatch):
    # --gap-extend through the full CLI: CPU engine, then the TPU
    # (checkpointed wavefront) engine — byte-identical responses.
    from seqalign_tpu import api
    from seqalign_tpu.constants import Device
    from seqalign_tpu.types import Response

    from .helpers import request_from_argv, response_tuple, run

    request = request_from_argv(
        "--gap-penalty", "6", "--gap-extend", "1", "--local",
        "data/dna/NC_018874.txt", "data/dna/dna_01.txt",
    )
    assert request.gap_extend == 1
    response = Response()
    assert api.align(request, response) == 0
    want, _ = bindings.oracle_fill_affine(
        1, request.text, request.pattern, request.score_matrix,
        request.alphabet_size, 6, 1,
    )
    assert response.score == want

    monkeypatch.setenv("SEQALIGN_ENGINE", "pallas_interpret")
    cpu = run(request, Device.CPU)
    tpu = run(request, Device.TPU)
    assert response_tuple(cpu) == response_tuple(tpu)


def test_affine_semi_global_cpu_tpu_identical(monkeypatch):
    # Affine semi-global ("fit", algo=2) runs on both devices and the
    # engines agree byte-for-byte (round 2 rejected the combination
    # with AFFINE_SEMI_ERROR; round 3 implements it across the oracle
    # and every accelerator engine).
    monkeypatch.setenv("SEQALIGN_ENGINE", "pallas_interpret")
    from seqalign_tpu.constants import AlignmentType, Device

    from .helpers import request_from_strings, response_tuple, run

    request = request_from_strings("ATCGATTACAGGATCG", "GATTACA")
    request.alignment_type = AlignmentType.SEMI_GLOBAL
    request.gap_extend = 2
    request.gap_penalty = 6
    cpu = run(request, Device.CPU)
    tpu = run(request, Device.TPU)
    assert response_tuple(cpu) == response_tuple(tpu)
    assert cpu.score == 35  # exact GATTACA fit: 7 matches * 5


def test_affine_semi_global_xla_engine_matches_cpu(monkeypatch):
    # The portable XLA engine has no affine traceback; SemiGlobal.align
    # routes affine fit to the native oracle there — same bytes out.
    monkeypatch.setenv("SEQALIGN_ENGINE", "xla")
    from seqalign_tpu.constants import AlignmentType, Device

    from .helpers import request_from_strings, response_tuple, run

    request = request_from_strings("ATCGATTACAGGATCG", "GATTACA")
    request.alignment_type = AlignmentType.SEMI_GLOBAL
    request.gap_extend = 2
    request.gap_penalty = 6
    cpu = run(request, Device.CPU)
    tpu = run(request, Device.TPU)
    assert response_tuple(cpu) == response_tuple(tpu)


def test_affine_checkpoint_fuzz_matches_oracle(monkeypatch):
    # Randomized affine alignments through the checkpointed wavefront
    # engine (multi-tile paths), byte-compared to sa_align_affine.
    monkeypatch.setenv("SEQALIGN_ENGINE", "pallas_interpret")
    from seqalign_tpu.ops import checkpoint

    rng = np.random.default_rng(33)
    sm = np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)
    for trial in range(6):
        n = int(rng.integers(2049, 4200))
        m = int(rng.integers(64, 1300))
        open_ = int(rng.integers(2, 10))
        ext = int(rng.integers(1, min(open_, 5)))
        # Cycle global / local / semi-global (algo 0 / 1 / 2).
        algo = trial % 3
        local = algo == 1
        semi = algo == 2
        t = rng.integers(0, 4, n).astype(np.int32)
        p = rng.integers(0, 4, m).astype(np.int32)
        score, _, _, at, ap, st, sp = checkpoint.checkpointed_align(
            t, p, sm, 4, open_, local=local, semi=semi, gap_extend=ext,
            ckpt_cols=2048, rps=1, slots=1024,
        )
        oat, oap, ost, osp, oscore = bindings.oracle_align_affine(
            algo, t.astype(np.int8), p.astype(np.int8),
            sm, 4, open_, ext,
        )
        assert score == oscore, (trial, n, m, open_, ext, algo)
        np.testing.assert_array_equal(at, oat)
        np.testing.assert_array_equal(ap, oap)
        assert (st, sp) == (ost, osp)
