"""Uniform-batch fast path parity (ops/pallas_fill.py `uniform=True`).

When every real pair's lengths equal the padded (N, M) exactly, the
batch kernels drop the per-cell validity masking (~3 fewer VPU ops on
the issue-bound fill): local tracks the running max bare, global/semi
skip in-loop tracking and read the score off the final DP row.  Results
must stay bit-identical to the masked path for scores, best cells and
direction words, including zero-length padding pairs (whose outputs are
garbage under BOTH contracts and are never compared).
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seqalign_tpu.ops import pallas_fill as pf


def _sm():
    sm = np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)
    sm[0, 1] = -2  # asymmetric: catches row/column transposition
    sm[1, 0] = -3
    return sm


def _batch(b=256, n=96, m=64, pad_pairs=5, seed=11):
    rng = np.random.default_rng(seed)
    texts = jnp.asarray(rng.integers(0, 4, (b, n)), jnp.int32)
    pats = jnp.asarray(rng.integers(0, 4, (b, m)), jnp.int32)
    ns = np.full((b,), n, np.int32)
    ms = np.full((b,), m, np.int32)
    # Trailing padding pairs: allowed under the uniform contract, their
    # outputs are garbage and excluded from comparison.
    ns[b - pad_pairs:] = 0
    ms[b - pad_pairs:] = 0
    real = np.arange(b) < b - pad_pairs
    return texts, pats, jnp.asarray(ns), jnp.asarray(ms), real


@pytest.mark.parametrize("local,semi", [
    (True, False), (False, False), (False, True),
])
@pytest.mark.parametrize("gap_extend", [None, 2])
@pytest.mark.parametrize("colprof", [True, False])
def test_uniform_score_matches_masked(local, semi, gap_extend, colprof):
    texts, pats, ns, ms, real = _batch()
    sm = jnp.asarray(_sm())
    kw = dict(
        k_alpha=4, local=local, semi=semi, gap_extend=gap_extend,
        tile_pairs=128, colprof=colprof, interpret=True,
    )
    masked = np.asarray(
        pf.batch_score_pallas(texts, pats, ns, ms, sm, 5, **kw)
    )
    fast = np.asarray(
        pf.batch_score_pallas(
            texts, pats, ns, ms, sm, 5, uniform=True, **kw
        )
    )
    np.testing.assert_array_equal(masked[real], fast[real])


@pytest.mark.parametrize("local,semi", [
    (True, False), (False, False), (False, True),
])
@pytest.mark.parametrize("gap_extend", [None, 2])
def test_uniform_dirs_matches_masked(local, semi, gap_extend):
    texts, pats, ns, ms, real = _batch()
    sm = jnp.asarray(_sm())
    kw = dict(
        k_alpha=4, local=local, semi=semi, gap_extend=gap_extend,
        tile_pairs=256, interpret=True,
    )
    m_out = pf.batch_fill_dirs_pallas(texts, pats, ns, ms, sm, 5, **kw)
    f_out = pf.batch_fill_dirs_pallas(
        texts, pats, ns, ms, sm, 5, uniform=True, **kw
    )
    names = ("scores", "best_is", "best_js", "dirs", "dirs2")
    for got, want, name in zip(f_out, m_out, names):
        if want is None:
            assert got is None
            continue
        got, want = np.asarray(got), np.asarray(want)
        if name in ("scores", "best_is", "best_js"):
            if name != "scores" and not (local or semi):
                continue  # global best cells are garbage by contract
            np.testing.assert_array_equal(
                want[real], got[real], err_msg=name
            )
        else:
            # Direction planes are slot-major; padding pairs interleave,
            # but the fill itself is mask-free in both modes, so the
            # planes must match everywhere.
            np.testing.assert_array_equal(want, got, err_msg=name)


def test_uniform_cell16_matches_int32():
    texts, pats, ns, ms, real = _batch(n=64, m=64)
    sm = jnp.asarray(_sm())
    kw = dict(k_alpha=4, local=True, tile_pairs=128, interpret=True)
    ref = np.asarray(
        pf.batch_score_pallas(
            texts, pats, ns, ms, sm, 5, uniform=True, colprof=True, **kw
        )
    )
    c16 = np.asarray(
        pf.batch_score_pallas(
            texts, pats, ns, ms, sm, 5, uniform=True, cell16=True,
            colprof=False, **kw
        )
    )
    np.testing.assert_array_equal(ref[real], c16[real])


def test_uniform_local_matches_oracle():
    from seqalign_tpu.native import bindings

    texts, pats, ns, ms, real = _batch(b=128, n=80, m=48, pad_pairs=3)
    sm = _sm()
    got = np.asarray(
        pf.batch_score_pallas(
            texts, pats, ns, ms, jnp.asarray(sm), 5, k_alpha=4,
            local=True, tile_pairs=128, uniform=True, interpret=True,
        )
    )
    t_np, p_np = np.asarray(texts), np.asarray(pats)
    for i in np.nonzero(real)[0][:16]:
        _, want, _ = bindings.oracle_fill(
            1, t_np[i].astype(np.int8), p_np[i].astype(np.int8), sm, 4, 5
        )
        assert got[i] == want, i


@pytest.mark.parametrize("local,semi,affine", [
    (True, False, False), (False, False, True), (False, True, True),
])
def test_uniform_lowers_for_tpu(local, semi, affine):
    rng = np.random.default_rng(3)
    sm = jnp.asarray(np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32))
    t = jnp.asarray(rng.integers(0, 4, (128, 64)), jnp.int32)
    p = jnp.asarray(rng.integers(0, 4, (128, 64)), jnp.int32)
    ns = jnp.full((128,), 64, jnp.int32)
    ms = jnp.full((128,), 64, jnp.int32)
    for fn_base in (pf.batch_score_pallas, pf.batch_fill_dirs_pallas):
        fn = functools.partial(
            fn_base, k_alpha=4, local=local, semi=semi,
            gap_extend=2 if affine else None, tile_pairs=128,
            uniform=True,
        )
        exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(
            t, p, ns, ms, sm, 5
        )
        assert len(exp.mlir_module_serialized) > 0
