"""Sequence-parallel single-pair engine on the 8-device virtual mesh."""

import numpy as np
import pytest

from seqalign_tpu.native import bindings
from seqalign_tpu.parallel.sequence import sequence_parallel_fill


def _dna_sm():
    return np.where(np.eye(4, dtype=bool), 5, -4).astype(np.int32)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("SEQALIGN_ENGINE", "pallas_interpret")


@pytest.mark.parametrize("local", [False, True])
def test_sequence_parallel_score(local):
    rng = np.random.default_rng(0)
    sm = _dna_sm()
    n, m = 10000, 300  # 8 strips of 2048 cols, 3 row blocks -> 10 supersteps
    text = rng.integers(0, 4, n).astype(np.int32)
    pattern = rng.integers(0, 4, m).astype(np.int32)

    score, bi, bj, _ = sequence_parallel_fill(
        text, pattern, sm, 4, 5, local=local, with_dirs=False
    )
    _, oscore, obest = bindings.oracle_fill(
        1 if local else 0, text.astype(np.int8), pattern.astype(np.int8),
        sm, 4, 5,
    )
    assert score == oscore
    if local:
        assert (bi, bj) == (obest // (n + 1), obest % (n + 1))


@pytest.mark.parametrize("algo", ["--global", "--local"])
def test_sequence_parallel_routed_through_api(algo, monkeypatch):
    # The aligner routes long pairs to the sequence-parallel engine when
    # a multi-device mesh is present (models/base.py); force the routing
    # thresholds down and check the full Request->Response path against
    # the CPU engine.
    from seqalign_tpu import config
    from seqalign_tpu.constants import Device

    from .helpers import request_from_argv, response_tuple, run

    monkeypatch.setattr(config, "MAX_HOST_DIRS_BYTES", 1)
    monkeypatch.setenv("SEQALIGN_SEQUENCE_PARALLEL", "1")
    request = request_from_argv(
        "--gap-penalty", "5", algo,
        "data/dna/NC_018874.txt", "data/dna/mutated_NC_018874.txt",
    )
    cpu = run(request, Device.CPU)
    tpu = run(request, Device.TPU)
    assert response_tuple(cpu) == response_tuple(tpu)


def test_sequence_parallel_dirs_buffer_is_tight():
    # The per-device dirs buffer holds exactly the strip's row blocks
    # (no superstep ramp padding) — the assembled words must still match
    # the oracle when t_blocks is small vs the device count.
    rng = np.random.default_rng(5)
    sm = _dna_sm()
    n, m = 8500, 130  # t_blocks=2 << 8 devices: mostly ramp supersteps
    text = rng.integers(0, 4, n).astype(np.int32)
    pattern = rng.integers(0, 4, m).astype(np.int32)
    score, _, _, words = sequence_parallel_fill(
        text, pattern, sm, 4, 3, local=False, with_dirs=True
    )
    odirs, oscore, _ = bindings.oracle_fill(
        0, text.astype(np.int8), pattern.astype(np.int8), sm, 4, 3
    )
    assert score == oscore
    rows = np.arange(1, m + 1)
    w = words[(rows - 1) // 16]
    got = (w >> (2 * ((rows - 1) % 16))[:, None]) & 3
    np.testing.assert_array_equal(got[:, :n], odirs[1:, 1:])


def test_sequence_parallel_dirs_and_traceback():
    rng = np.random.default_rng(1)
    sm = _dna_sm()
    n, m = 9000, 200
    text = rng.integers(0, 4, n).astype(np.int32)
    pattern = rng.integers(0, 4, m).astype(np.int32)

    score, bi, bj, words = sequence_parallel_fill(
        text, pattern, sm, 4, 5, local=False, with_dirs=True
    )
    odirs, oscore, _ = bindings.oracle_fill(
        0, text.astype(np.int8), pattern.astype(np.int8), sm, 4, 5
    )
    assert score == oscore
    rows = np.arange(1, m + 1)
    w = words[(rows - 1) // 16]
    got = (w >> (2 * ((rows - 1) % 16))[:, None]) & 3
    np.testing.assert_array_equal(got[:, :n], odirs[1:, 1:])

    at, ap, st, sp = bindings.traceback_packed(
        0, words, text, pattern, 4
    )
    oat, oap, ost, osp, _ = bindings.oracle_align(
        0, text.astype(np.int8), pattern.astype(np.int8), sm, 4, 5
    )
    np.testing.assert_array_equal(at, oat)
    np.testing.assert_array_equal(ap, oap)
    assert (st, sp) == (ost, osp)


@pytest.mark.parametrize(
    "mode",
    [{}, {"local": True}, {"gap_extend": 2}],
    ids=["global", "local", "affine"],
)
def test_sequence_parallel_checkpointed_alignment(mode):
    # The production multi-device path: pipelined wavefront-strip
    # checkpoint fill across the mesh + the standard single-chip
    # path-tile traceback, byte-identical to the oracle.  Small
    # geometry: 3 strips of 1024 rows over 8 devices, 3 text chunks.
    from seqalign_tpu.ops.checkpoint import checkpointed_traceback
    from seqalign_tpu.parallel.sequence import (
        sequence_parallel_checkpointed_fill,
    )

    rng = np.random.default_rng(11)
    sm = _dna_sm()
    n, m = 5000, 2600
    text = rng.integers(0, 4, n).astype(np.int32)
    pattern = rng.integers(0, 4, m).astype(np.int32)
    gap = 6 if "gap_extend" in mode else 5

    ck = sequence_parallel_checkpointed_fill(
        text, pattern, sm, 4, gap, ckpt_cols=2048, rps=1, slots=1024,
        **mode,
    )
    at, ap, st, sp = checkpointed_traceback(ck, text, pattern, sm, 4)
    if "gap_extend" in mode:
        oat, oap, ost, osp, oscore = bindings.oracle_align_affine(
            1 if mode.get("local") else 0,
            text.astype(np.int8), pattern.astype(np.int8), sm, 4, gap,
            mode["gap_extend"],
        )
    else:
        oat, oap, ost, osp, oscore = bindings.oracle_align(
            1 if mode.get("local") else 0,
            text.astype(np.int8), pattern.astype(np.int8), sm, 4, gap,
        )
    assert ck.score == oscore
    np.testing.assert_array_equal(at, oat)
    np.testing.assert_array_equal(ap, oap)
    assert (st, sp) == (ost, osp)


def test_sequence_parallel_checkpointed_single_strip_long_text():
    # One strip (pattern < rows), many chunks: exercises the left-column
    # carry with no inter-device halo consumption beyond strip 0.
    from seqalign_tpu.ops.checkpoint import checkpointed_traceback
    from seqalign_tpu.parallel.sequence import (
        sequence_parallel_checkpointed_fill,
    )

    rng = np.random.default_rng(13)
    sm = _dna_sm()
    n, m = 9000, 700
    text = rng.integers(0, 4, n).astype(np.int32)
    pattern = rng.integers(0, 4, m).astype(np.int32)

    ck = sequence_parallel_checkpointed_fill(
        text, pattern, sm, 4, 4, local=True,
        ckpt_cols=2048, rps=1, slots=1024,
    )
    at, ap, st, sp = checkpointed_traceback(ck, text, pattern, sm, 4)
    oat, oap, ost, osp, oscore = bindings.oracle_align(
        1, text.astype(np.int8), pattern.astype(np.int8), sm, 4, 4
    )
    assert ck.score == oscore
    np.testing.assert_array_equal(at, oat)
    np.testing.assert_array_equal(ap, oap)
    assert (st, sp) == (ost, osp)
