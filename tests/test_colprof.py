"""Packed substitution-column (colprof) kernel mode parity.

The k<=4 batch kernels default to reading packed per-position
substitution columns (ops/pallas_fill.pack_text_colprof): the per-cell
lookup is shift+mask+debias instead of the (k-1)-deep select chain.
Both modes must produce bit-identical scores, best cells and direction
words (the chain mode stays reachable via SEQALIGN_DNA_COLPROF=0 /
colprof=False).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seqalign_tpu.ops import pallas_fill as pf


def _sm():
    sm = np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)
    sm[0, 1] = -2  # asymmetric: catches row/column transposition
    sm[1, 0] = -3
    sm[2, 3] = 7
    return sm


def test_pack_text_colprof_bytes():
    sm = _sm()
    lets = jnp.asarray([0, 1, 2, 3], jnp.int32)
    packed = np.asarray(jax.device_get(pf.pack_text_colprof(lets, sm, 4)))
    for j in range(4):          # text letter (column of sm)
        for a in range(4):      # pattern letter (row of sm) = byte slot
            byte = (packed[j] >> (8 * a)) & 0xFF
            assert byte - pf.SUB_BIAS == sm[a, j], (a, j)


@pytest.mark.parametrize("local,semi", [
    (True, False), (False, False), (False, True),
])
@pytest.mark.parametrize("gap_extend", [None, 2])
def test_colprof_matches_chain_score_and_dirs(local, semi, gap_extend):
    rng = np.random.default_rng(21)
    b, n, m = 256, 96, 64
    sm = jnp.asarray(_sm())
    texts = jnp.asarray(rng.integers(0, 4, (b, n)), jnp.int32)
    pats = jnp.asarray(rng.integers(0, 4, (b, m)), jnp.int32)
    ns = jnp.asarray(rng.integers(30, n + 1, (b,)), jnp.int32)
    ms = jnp.asarray(rng.integers(20, m + 1, (b,)), jnp.int32)

    kw = dict(
        k_alpha=4, local=local, semi=semi, gap_extend=gap_extend,
        interpret=True,
    )
    chain = pf.batch_score_pallas(
        texts, pats, ns, ms, sm, 5, colprof=False, **kw
    )
    col = pf.batch_score_pallas(
        texts, pats, ns, ms, sm, 5, colprof=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(chain), np.asarray(col))

    chain_d = pf.batch_fill_dirs_pallas(
        texts, pats, ns, ms, sm, 5, tile_pairs=256, colprof=False, **kw
    )
    col_d = pf.batch_fill_dirs_pallas(
        texts, pats, ns, ms, sm, 5, tile_pairs=256, colprof=True, **kw
    )
    for got, want, name in zip(
        col_d, chain_d, ("scores", "best_is", "best_js", "dirs", "dirs2")
    ):
        if want is None:
            assert got is None
            continue
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want), err_msg=name
        )


def test_colprof_scores_match_oracle():
    # End-to-end: colprof scores against the native oracle (not just the
    # chain kernel), local + global.
    from seqalign_tpu.native import bindings

    rng = np.random.default_rng(22)
    b, n, m = 128, 80, 48
    sm = _sm()
    texts = rng.integers(0, 4, (b, n)).astype(np.int32)
    pats = rng.integers(0, 4, (b, m)).astype(np.int32)
    ns = rng.integers(10, n + 1, b).astype(np.int32)
    ms = rng.integers(8, m + 1, b).astype(np.int32)
    for local in (True, False):
        got = np.asarray(
            pf.batch_score_pallas(
                jnp.asarray(texts), jnp.asarray(pats), jnp.asarray(ns),
                jnp.asarray(ms), jnp.asarray(sm), 5, k_alpha=4,
                local=local, colprof=True, interpret=True,
            )
        )
        for i in range(b):
            _, want, _ = bindings.oracle_fill(
                1 if local else 0,
                texts[i, : ns[i]].astype(np.int8),
                pats[i, : ms[i]].astype(np.int8),
                sm, 4, 5,
            )
            assert got[i] == want, (local, i)
