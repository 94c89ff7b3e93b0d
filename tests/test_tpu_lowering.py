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
