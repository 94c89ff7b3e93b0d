"""Hardware-free TPU lowering regression tests.

`jax.export.export(jit_f, platforms=["tpu"])` runs the full Pallas →
Mosaic lowering pipeline with no TPU attached, so a kernel change that
breaks TPU lowering (dtype mismatch in the Mosaic dialect, bad block
spec, unsupported op) fails HERE instead of 3–6 minutes into a remote
AOT compile on the chip.  (It does NOT cover the Mosaic *backend*
compile — see BENCH_NOTES on the rps=32 crash — but it catches the
whole class of lowering-time regressions.)  Shapes are kept tiny; each
export is sub-second.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seqalign_tpu.ops import wavefront as wf
from seqalign_tpu.ops.pallas_fill import (
    batch_fill_dirs_pallas,
    batch_score_pallas,
)


def _export_ok(fn, *args):
    exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert len(exp.mlir_module_serialized) > 0


def _dna_batch(b=128, n=64, m=64):
    rng = np.random.default_rng(3)
    sm = jnp.asarray(np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32))
    t = jnp.asarray(rng.integers(0, 4, (b, n)), jnp.int32)
    p = jnp.asarray(rng.integers(0, 4, (b, m)), jnp.int32)
    ns = jnp.full((b,), n, jnp.int32)
    ms = jnp.full((b,), m, jnp.int32)
    return t, p, ns, ms, sm


@pytest.mark.parametrize("cell16,colprof", [
    (False, True),   # default DNA path: packed substitution columns
    (False, False),  # select-chain fallback (SEQALIGN_DNA_COLPROF=0)
    (True, False),
])
@pytest.mark.parametrize("local,semi,affine", [
    (True, False, False), (False, False, True), (False, True, True),
])
def test_batch_score_lowers_for_tpu(cell16, colprof, local, semi, affine):
    t, p, ns, ms, sm = _dna_batch()
    fn = functools.partial(
        batch_score_pallas, k_alpha=4, local=local, semi=semi,
        gap_extend=2 if affine else None, tile_pairs=128, cell16=cell16,
        colprof=colprof,
    )
    _export_ok(fn, t, p, ns, ms, sm, 5)


@pytest.mark.parametrize("cell16,colprof", [
    (False, True), (False, False), (True, False),
])
@pytest.mark.parametrize("affine", [False, True])
def test_batch_dirs_lowers_for_tpu(cell16, colprof, affine):
    t, p, ns, ms, sm = _dna_batch()
    fn = functools.partial(
        batch_fill_dirs_pallas, k_alpha=4, local=True,
        gap_extend=2 if affine else None, tile_pairs=128, cell16=cell16,
        colprof=colprof,
    )
    _export_ok(fn, t, p, ns, ms, sm, 5)


def test_batch_score_protein_packed_lowers_for_tpu():
    rng = np.random.default_rng(5)
    k = 23
    smp = rng.integers(-8, 12, (k, k)).astype(np.int32)
    smp = jnp.asarray(((smp + smp.T) // 2).astype(np.int32))
    t = jnp.asarray(rng.integers(0, k, (128, 64)), jnp.int32)
    p = jnp.asarray(rng.integers(0, k, (128, 64)), jnp.int32)
    ns = jnp.full((128,), 64, jnp.int32)
    ms = jnp.full((128,), 64, jnp.int32)
    for cell16 in (False, True):
        fn = functools.partial(
            batch_score_pallas, k_alpha=k, local=True, tile_pairs=128,
            cell16=cell16,
        )
        _export_ok(fn, t, p, ns, ms, smp, 10)


@pytest.mark.parametrize("affine", [False, True])
@pytest.mark.parametrize("local,semi", [
    (True, False), (False, False), (False, True),
])
def test_batch_pallas_walker_lowers_for_tpu(affine, local, semi):
    # The per-pair walker's SMEM block shapes hit Mosaic's sublane
    # divisibility rule on the real backend while interpret mode
    # sailed through (round-4 batch-e2e crash) — keep it lowering.
    from seqalign_tpu.ops.batch_traceback import batch_pallas_traceback

    rng = np.random.default_rng(9)
    b, w_rows, n_cols = 128, 4, 64
    dirs = jnp.asarray(
        rng.integers(np.iinfo(np.int32).min, np.iinfo(np.int32).max,
                     (1, w_rows, n_cols, 1, 128)),
        jnp.int32,
    )
    dirs2 = (
        jnp.asarray(
            rng.integers(0, 4, (1, w_rows, n_cols, 1, 128)), jnp.int32
        )
        if affine
        else None
    )
    ns = jnp.full((b,), n_cols, jnp.int32)
    ms = jnp.full((b,), w_rows * 16, jnp.int32)
    bis = jnp.full((b,), 3, jnp.int32)
    bjs = jnp.full((b,), 5, jnp.int32)

    def call(dirs, ns, ms, bis, bjs, *rest):
        return batch_pallas_traceback(
            dirs, ns, ms, bis, bjs, local=local, semi=semi,
            max_len=128, dirs2=rest[0] if rest else None,
        )

    args = (dirs, ns, ms, bis, bjs) + ((dirs2,) if affine else ())
    _export_ok(call, *args)


@pytest.mark.parametrize("rps,slots", [
    (8, 128),          # default-family geometry
    (32, 128),         # split-body path (SPLIT_BODY_RPS) — the round-2
                       # Mosaic crash class; must keep lowering
])
def test_wavefront_strip_lowers_for_tpu(rps, slots):
    rng = np.random.default_rng(7)
    sm = jnp.asarray(np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32))
    n = wf.STEPS  # one grid block
    rows = rps * slots
    text = rng.integers(0, 4, n).astype(np.int32)
    steps_pad = -(-(n + slots - 1) // wf.STEPS) * wf.STEPS
    nb = steps_pad // wf.STEPS
    ts = jnp.asarray(np.pad(text, (0, steps_pad - n)).reshape(nb, wf.STEPS))
    bot = jnp.zeros((nb, wf.STEPS), jnp.int32)
    pat = jnp.asarray(
        rng.integers(0, 4, rows).astype(np.int32)
        .reshape(slots, rps).T.reshape(rps, slots // 128, 128)
    )

    def call(ts, bot, pat, sm):
        return wf.wavefront_strip(
            ts, bot, pat, sm, 5, n, rows, 0, k_alpha=4, local=False,
            with_dirs=True, rps=rps, slots=slots,
        )[2]

    _export_ok(call, ts, bot, pat, sm)
