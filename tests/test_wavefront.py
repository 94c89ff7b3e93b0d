"""Skewed-wavefront kernel tests (interpreter mode) vs the oracle."""

import numpy as np
import pytest

from seqalign_tpu.native import bindings
from seqalign_tpu.ops.wavefront import SLOTS, strip_rows, wavefront_fill


def _dna_sm():
    return np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)


def _skew_dirs(words, steps_pad, rps, m, n, slots=SLOTS):
    """Decode the skewed word format into (m, n) direction bytes."""
    out = np.empty((m, n), dtype=np.int32)
    rows = rps * slots
    for i in range(1, m + 1):
        c = (i - 1) // rows
        ri = (i - 1) % rows
        s = ri // rps
        r = ri % rps
        t = np.arange(1, n + 1) - 1 + s
        w = words[c, (t // 16) * rps + r, s]
        out[i - 1] = (w >> (2 * (t % 16))) & 3
    return out


@pytest.mark.parametrize("local", [False, True])
# rps=32 exercises the split word body (SPLIT_BODY_RPS — two
# half-unrolled fori trips instead of one 16-step unroll).
@pytest.mark.parametrize("rps", [1, 8, 32])
def test_wavefront_matches_oracle(local, rps):
    rng = np.random.default_rng(17 + rps)
    sm = _dna_sm()
    # Cross a strip boundary for rps=1 (1024 rows/strip).
    n, m = 1500, 1100
    text = rng.integers(0, 4, n).astype(np.int32)
    pattern = rng.integers(0, 4, m).astype(np.int32)

    score, bi, bj, words, steps_pad = wavefront_fill(
        text, pattern, sm, 4, 5, local=local, with_dirs=True, rps=rps,
        interpret=True,
    )
    odirs, oscore, obest = bindings.oracle_fill(
        1 if local else 0, text.astype(np.int8), pattern.astype(np.int8),
        sm, 4, 5,
    )
    assert score == oscore
    if local:
        assert (bi, bj) == (obest // (n + 1), obest % (n + 1))

    np.testing.assert_array_equal(
        _skew_dirs(words, steps_pad, rps, m, n), odirs[1:, 1:]
    )

    at, ap, st, sp = bindings.traceback_skewed(
        1 if local else 0, words, steps_pad, text, pattern, 4,
        best_i=bi, best_j=bj, rps=rps,
    )
    oat, oap, ost, osp, _ = bindings.oracle_align(
        1 if local else 0, text.astype(np.int8), pattern.astype(np.int8),
        sm, 4, 5,
    )
    np.testing.assert_array_equal(at, oat)
    np.testing.assert_array_equal(ap, oap)
    assert (st, sp) == (ost, osp)


def test_wavefront_multistrip_rps8():
    # Cross the 8192-row strip boundary at rps=8.
    rng = np.random.default_rng(3)
    sm = _dna_sm()
    n, m = 9000, 8500
    text = rng.integers(0, 4, n).astype(np.int32)
    pattern = rng.integers(0, 4, m).astype(np.int32)
    score, bi, bj, words, steps_pad = wavefront_fill(
        text, pattern, sm, 4, 5, local=True, with_dirs=False, rps=8,
        interpret=True,
    )
    _, oscore, obest = bindings.oracle_fill(
        1, text.astype(np.int8), pattern.astype(np.int8), sm, 4, 5
    )
    assert score == oscore
    assert (bi, bj) == (obest // (n + 1), obest % (n + 1))


def test_wavefront_protein():
    rng = np.random.default_rng(9)
    from seqalign_tpu.bench.suite import _blosum50

    sm = _blosum50()
    n, m = 400, 250
    text = rng.integers(0, 23, n).astype(np.int32)
    pattern = rng.integers(0, 23, m).astype(np.int32)
    score, bi, bj, words, steps_pad = wavefront_fill(
        text, pattern, sm, 23, 7, local=True, with_dirs=True, interpret=True
    )
    _, oscore, obest = bindings.oracle_fill(
        1, text.astype(np.int8), pattern.astype(np.int8), sm, 23, 7
    )
    assert score == oscore
    assert (bi, bj) == (obest // (n + 1), obest % (n + 1))


@pytest.mark.parametrize("local", [False, True])
def test_wavefront_wide_slots_score(local):
    # Widened-slot score-only strip (multi-vreg vector ops): run one
    # 2x256-row strip directly and check the score outputs vs the oracle.
    import jax.numpy as jnp

    from seqalign_tpu.ops import wavefront as wf

    rng = np.random.default_rng(23)
    sm = _dna_sm()
    slots, rps = 256, 2
    n, m = 700, 2 * slots  # exactly one strip of 512 rows
    text = rng.integers(0, 4, n).astype(np.int32)
    pattern = rng.integers(0, 4, m).astype(np.int32)

    steps_pad = -(-(n + slots - 1) // wf.STEPS) * wf.STEPS
    nb = steps_pad // wf.STEPS
    ts = jnp.asarray(np.pad(text, (0, steps_pad - n)).reshape(nb, wf.STEPS))
    if local:
        bot = jnp.zeros((nb, wf.STEPS), jnp.int32)
    else:
        bot = jnp.asarray(
            (-5 * (np.arange(steps_pad, dtype=np.int64) + 1))
            .astype(np.int32).reshape(nb, wf.STEPS)
        )
    chunk = pattern.reshape(slots, rps)
    pat_slots = jnp.asarray(
        np.ascontiguousarray(chunk.T).reshape(rps, slots // 128, 128)
    )
    _, bot_out, rowmax, argj, snap, ckpts = wf.wavefront_strip(
        ts, bot, pat_slots, sm, 5, n, m, 0,
        k_alpha=4, local=local, with_dirs=False, rps=rps,
        ckpt_every=512, slots=slots, interpret=True,
    )
    odirs, oscore, obest = bindings.oracle_fill(
        1 if local else 0, text.astype(np.int8), pattern.astype(np.int8),
        sm, 4, 5,
    )
    if local:
        score, bi, bj = wf.merge_local_best(
            [np.asarray(rowmax).reshape(rps, -1)],
            [np.asarray(argj).reshape(rps, -1)],
            rps * slots, rps, m, slots=slots,
        )
        assert score == oscore
        assert (bi, bj) == (obest // (n + 1), obest % (n + 1))
    else:
        slot_idx = ((m - 1) % (rps * slots)) // rps
        assert int(np.asarray(snap).reshape(-1)[slot_idx]) == oscore

    # Column checkpoints hold exact DP column values: re-derive S[:, 512]
    # from a fresh oracle fill of the truncated text.
    from seqalign_tpu.native.bindings import oracle_fill as ofill
    import numpy as _np

    # S[i, 512] via oracle on text[:512] last column == full-matrix col
    # (left-to-right DP): compare against ckpts plane 0.
    col = 512
    _, _, _ = ofill(1 if local else 0, text[:col].astype(np.int8),
                    pattern.astype(np.int8), sm, 4, 5)
    # cheap exact recompute of column `col` values:
    g = 5
    prev = _np.zeros(col + 1, _np.int64) if local else -g * _np.arange(col + 1)
    want = _np.empty(m, _np.int64)
    for i in range(1, m + 1):
        cur = _np.empty(col + 1, _np.int64)
        cur[0] = 0 if local else -g * i
        for j in range(1, col + 1):
            v = max(prev[j - 1] + sm[pattern[i - 1], text[j - 1]],
                    prev[j] - g, cur[j - 1] - g)
            cur[j] = max(v, 0) if local else v
        want[i - 1] = cur[col]
        prev = cur
    num_ckpts = ckpts.shape[0] // rps
    got = (
        np.asarray(ckpts).reshape(num_ckpts, rps, slots)
        .transpose(0, 2, 1).reshape(num_ckpts, rps * slots)[0]
    )
    np.testing.assert_array_equal(got[:m].astype(np.int64), want)


@pytest.mark.parametrize("local", [False, True])
def test_wavefront_wide_slots_dirs(local):
    # Widened-slot fill WITH the direction stream: the skewed format and
    # its walkers take the slot width as a factor.
    slots, rps = 256, 2
    rng = np.random.default_rng(29)
    sm = _dna_sm()
    n, m = 700, 1100  # crosses a 512-row strip boundary
    text = rng.integers(0, 4, n).astype(np.int32)
    pattern = rng.integers(0, 4, m).astype(np.int32)

    score, bi, bj, words, steps_pad = wavefront_fill(
        text, pattern, sm, 4, 5, local=local, with_dirs=True, rps=rps,
        slots=slots, interpret=True,
    )
    odirs, oscore, obest = bindings.oracle_fill(
        1 if local else 0, text.astype(np.int8), pattern.astype(np.int8),
        sm, 4, 5,
    )
    assert score == oscore
    np.testing.assert_array_equal(
        _skew_dirs(words, steps_pad, rps, m, n, slots=slots),
        odirs[1:, 1:],
    )
    at, ap, st, sp = bindings.traceback_skewed(
        1 if local else 0, words, steps_pad, text, pattern, 4,
        best_i=bi, best_j=bj, rps=rps, slots=slots,
    )
    oat, oap, ost, osp, _ = bindings.oracle_align(
        1 if local else 0, text.astype(np.int8), pattern.astype(np.int8),
        sm, 4, 5,
    )
    np.testing.assert_array_equal(at, oat)
    np.testing.assert_array_equal(ap, oap)
    assert (st, sp) == (ost, osp)
