"""Semi-global ("fit") alignment tests — an extension beyond the
reference (its SEMI_GLOBAL enum value is unreachable from its CLI).
The native oracle defines the contract; validated against a brute-force
DP and by path re-scoring."""

import numpy as np
import pytest

from seqalign_tpu.native import bindings


def _dna_sm():
    return np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)


def _brute_semi(text, pattern, sm, gap):
    n, m = len(text), len(pattern)
    h = np.zeros((m + 1, n + 1), np.int64)
    for i in range(1, m + 1):
        h[i, 0] = -gap * i
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            h[i, j] = max(
                h[i - 1, j - 1] + sm[pattern[i - 1], text[j - 1]],
                h[i - 1, j] - gap,
                h[i, j - 1] - gap,
            )
    return int(h[m].max())


def test_oracle_semi_vs_brute_force():
    rng = np.random.default_rng(41)
    sm = _dna_sm()
    for trial in range(10):
        n, m = int(rng.integers(5, 120)), int(rng.integers(3, 80))
        gap = int(rng.integers(1, 9))
        t = rng.integers(0, 4, n).astype(np.int8)
        p = rng.integers(0, 4, m).astype(np.int8)
        _, score, _ = bindings.oracle_fill(2, t, p, sm, 4, gap)
        assert score == _brute_semi(t, p, sm, gap), (trial, n, m, gap)


def test_oracle_semi_traceback_properties():
    # The emitted alignment must re-score to the optimal value (text
    # end-gaps free), consume the FULL pattern, and reconstruct the
    # claimed text window.
    rng = np.random.default_rng(42)
    sm = _dna_sm()
    for trial in range(8):
        n, m = int(rng.integers(20, 200)), int(rng.integers(5, 120))
        gap = int(rng.integers(1, 7))
        t = rng.integers(0, 4, n).astype(np.int8)
        p = rng.integers(0, 4, m).astype(np.int8)
        at, ap, st, sp, score = bindings.oracle_align(2, t, p, sm, 4, gap)
        assert sp == 0
        path = 0
        for a, b in zip(at.tolist(), ap.tolist()):
            if a == 4 or b == 4:
                path -= gap
            else:
                path += int(sm[b, a])
        assert path == score == _brute_semi(t, p, sm, gap)
        p_sub = ap[ap != 4]
        np.testing.assert_array_equal(p_sub, p.astype(np.uint8))  # full pattern
        t_sub = at[at != 4]
        np.testing.assert_array_equal(
            t_sub, t[st : st + t_sub.shape[0]].astype(np.uint8)
        )


def test_semi_fit_finds_embedded_pattern():
    # A pattern embedded mid-text must fit exactly with a full-match
    # score and the right start offset.
    sm = _dna_sm()
    rng = np.random.default_rng(43)
    pattern = rng.integers(0, 4, 30).astype(np.int8)
    text = np.concatenate([
        rng.integers(0, 4, 57), pattern, rng.integers(0, 4, 41)
    ]).astype(np.int8)
    at, ap, st, sp, score = bindings.oracle_align(2, text, pattern, sm, 4, 5)
    assert score == 30 * 5
    assert st == 57 and sp == 0
    assert at.shape[0] == 30 and not (at == 4).any() and not (ap == 4).any()


@pytest.mark.parametrize("device_flag", ["-c", "-g"])
def test_semi_cli_and_engines(device_flag, monkeypatch):
    # --semi-global through the full CLI; CPU oracle and accelerator
    # (XLA row-scan) engines must be byte-identical.
    from seqalign_tpu.constants import Device

    from .helpers import request_from_argv, response_tuple, run

    request = request_from_argv(
        "--gap-penalty", "4", "--semi-global",
        "data/dna/NC_018874.txt", "data/dna/dna_02.txt",
    )
    cpu = run(request, Device.CPU)
    tpu = run(request, Device.TPU)
    assert response_tuple(cpu) == response_tuple(tpu)
    assert device_flag  # parametrized for two independent runs


def test_semi_checkpoint_engine_vs_oracle(monkeypatch):
    # Multi-tile semi through the checkpointed wavefront engine
    # (interpret mode), byte-compared to the oracle.
    monkeypatch.setenv("SEQALIGN_ENGINE", "pallas_interpret")
    from seqalign_tpu.ops import checkpoint

    rng = np.random.default_rng(45)
    sm = _dna_sm()
    for trial in range(3):
        n, m = int(rng.integers(2100, 4200)), int(rng.integers(200, 1300))
        gap = int(rng.integers(1, 7))
        t = rng.integers(0, 4, n).astype(np.int32)
        p = rng.integers(0, 4, m).astype(np.int32)
        score, bi, bj, at, ap, st, sp = checkpoint.checkpointed_align(
            t, p, sm, 4, gap, semi=True, ckpt_cols=2048, rps=1, slots=1024,
        )
        oat, oap, ost, osp, oscore = bindings.oracle_align(
            2, t.astype(np.int8), p.astype(np.int8), sm, 4, gap
        )
        assert score == oscore, (trial, n, m, gap)
        np.testing.assert_array_equal(at, oat)
        np.testing.assert_array_equal(ap, oap)
        assert (st, sp) == (ost, osp)


def test_semi_api_pallas_interpret(monkeypatch):
    # SemiGlobal model routed through the checkpoint engine.
    monkeypatch.setenv("SEQALIGN_ENGINE", "pallas_interpret")
    from seqalign_tpu.constants import Device

    from .helpers import request_from_argv, response_tuple, run

    request = request_from_argv(
        "--gap-penalty", "4", "--semi-global",
        "data/dna/dna_01.txt", "data/dna/dna_02.txt",
    )
    cpu = run(request, Device.CPU)
    tpu = run(request, Device.TPU)
    assert response_tuple(cpu) == response_tuple(tpu)


def test_semi_batch_engines_vs_oracle():
    # Batched semi scoring: the Pallas inter-pair kernel (interpret) and
    # the vmapped XLA engine, both vs the oracle.
    import jax
    import jax.numpy as jnp

    from seqalign_tpu.ops.batch import batch_score
    from seqalign_tpu.ops.pallas_fill import batch_score_pallas

    rng = np.random.default_rng(46)
    sm = _dna_sm()
    b, n, m = 128, 96, 48
    texts = rng.integers(0, 4, (b, n)).astype(np.int32)
    patterns = rng.integers(0, 4, (b, m)).astype(np.int32)
    ns = rng.integers(n // 2, n + 1, b).astype(np.int32)
    ms = rng.integers(m // 2, m + 1, b).astype(np.int32)
    args = (
        jnp.asarray(texts), jnp.asarray(patterns), jnp.asarray(ns),
        jnp.asarray(ms), jnp.asarray(sm), 5,
    )
    out_pl = np.asarray(jax.device_get(batch_score_pallas(
        *args, k_alpha=4, semi=True, interpret=True
    )))
    out_xla = np.asarray(jax.device_get(batch_score(*args, semi=True)))
    for idx in rng.integers(0, b, 12):
        _, want, _ = bindings.oracle_fill(
            2, texts[idx, : ns[idx]].astype(np.int8),
            patterns[idx, : ms[idx]].astype(np.int8), sm, 4, 5,
        )
        assert out_pl[idx] == want, int(idx)
        assert out_xla[idx] == want, int(idx)


def test_semi_scan_engine_random_vs_oracle():
    import jax.numpy as jnp

    from seqalign_tpu.ops import scan_engine

    rng = np.random.default_rng(44)
    sm = _dna_sm()
    for trial in range(5):
        n, m = int(rng.integers(10, 400)), int(rng.integers(5, 300))
        gap = int(rng.integers(1, 7))
        t = rng.integers(0, 4, n).astype(np.int32)
        p = rng.integers(0, 4, m).astype(np.int32)
        width = scan_engine.padded_width(n)
        prof = scan_engine.build_profile(
            jnp.asarray(t), jnp.asarray(sm), width
        )
        pat = jnp.asarray(
            scan_engine.pad_pattern(p, scan_engine.padded_rows(m))
        )
        _, best, bidx = scan_engine.semi_fill(prof, pat, gap, n, m,
                                              with_dirs=False)
        odirs, oscore, obest = bindings.oracle_fill(
            2, t.astype(np.int8), p.astype(np.int8), sm, 4, gap
        )
        assert int(best) == oscore
        assert (int(bidx) // width, int(bidx) % width) == (
            obest // (n + 1), obest % (n + 1)
        )


def test_semi_degenerate_all_mismatch_tie():
    # With an all-negative matrix the whole last row ties H[m][0] (the
    # all-gap fit); every engine must agree on the j>=1 start contract.
    import jax.numpy as jnp

    from seqalign_tpu.ops import scan_engine

    sm = np.full((4, 4), -100, np.int32)
    t = np.zeros(6, np.int8)
    p = np.ones(3, np.int8)
    odirs, oscore, obest = bindings.oracle_fill(2, t, p, sm, 4, 1)
    assert oscore == -3 and obest % 7 == 1  # first j >= 1
    at, ap, st, sp, score = bindings.oracle_align(2, t, p, sm, 4, 1)
    assert score == -3

    width = scan_engine.padded_width(6)
    prof = scan_engine.build_profile(
        jnp.asarray(t.astype(np.int32)), jnp.asarray(sm), width
    )
    pat = jnp.asarray(
        scan_engine.pad_pattern(p.astype(np.int32), scan_engine.padded_rows(3))
    )
    _, best, bidx = scan_engine.semi_fill(prof, pat, 1, 6, 3, with_dirs=False)
    assert int(best) == -3 and int(bidx) % width == 1
