"""Tier-4 exhaustive batch sweeps (mirrors tests.cu:463-551).

Every pair of files in data/dna and data/protein x {global, local},
oracle engine vs accelerator engine.  Like the reference, scores are
always compared; aligned strings and offsets only for global (local
optima are non-unique only across implementations with different tie
policies — ours match, but we mirror the reference's checks).

The reference caps text length at 20000 bytes (tests.cu:486-487); CI
uses smaller caps for runtime.  SEQALIGN_SWEEP_FULL=1 runs the full
reference-equivalent 20000-byte sweep (both alphabets); the individual
SEQALIGN_SWEEP_CAP_DNA / _PROTEIN variables override either cap.
"""

import itertools
import os

import pytest

from seqalign_tpu.constants import AlignmentType, Device

from .helpers import files_in, request_from_argv, response_tuple, run

_FULL = os.environ.get("SEQALIGN_SWEEP_FULL", "") == "1"
DNA_CAP = int(
    os.environ.get("SEQALIGN_SWEEP_CAP_DNA", 20000 if _FULL else 8000)
)
PROTEIN_CAP = int(
    os.environ.get("SEQALIGN_SWEEP_CAP_PROTEIN", 20000 if _FULL else 1200)
)


def _sweep(directory, type_flag, gap, cap):
    files = files_in(directory)
    checked = 0
    for a, b in itertools.combinations(files, 2):
        for align_flag in ("--global", "--local"):
            request = request_from_argv(
                type_flag, "--gap-penalty", str(gap), align_flag, a, b
            )
            if request.text_num_bytes > cap:
                continue
            cpu = run(request, Device.CPU)
            tpu = run(request, Device.TPU)
            assert cpu.score == tpu.score, (a, b, align_flag)
            if align_flag == "--global":
                assert response_tuple(cpu) == response_tuple(tpu), (
                    a, b, align_flag,
                )
            checked += 1
    assert checked > 0


def test_batch_dna_alignment():
    _sweep("data/dna", "--dna", 11, DNA_CAP)


def test_batch_protein_alignment():
    _sweep("data/protein", "--protein", 5, PROTEIN_CAP)


def test_checkpoint_route_real_pair_default_ci(monkeypatch):
    """One >8000-byte real repo DNA pair through the Pallas engines'
    checkpoint route in every default pytest run (not just under
    SEQALIGN_SWEEP_FULL): budget shrunk + direct disabled so the
    wavefront router falls through to the checkpointed engine
    (ops/checkpoint.py), byte-compared against the CPU oracle — the
    reference's 20000-cap sweep tier at CI-affordable size
    (tests.cu:486-487)."""
    from seqalign_tpu import config
    from seqalign_tpu.models import base as base_mod
    from seqalign_tpu.ops import direct

    monkeypatch.setenv("SEQALIGN_ENGINE", "pallas_interpret")
    monkeypatch.setattr(config, "MAX_HOST_DIRS_BYTES", 65536)
    monkeypatch.setattr(direct, "fits_direct", lambda *a, **k: False)
    called = {}
    orig = base_mod.PairAligner._align_checkpoint

    def spy(self, *a, **k):
        called["checkpoint"] = True
        return orig(self, *a, **k)

    monkeypatch.setattr(base_mod.PairAligner, "_align_checkpoint", spy)

    request = request_from_argv(
        "--dna", "--gap-penalty", "11", "--global",
        "data/dna/GCA_003433695.txt", "data/dna/GCA_003231495.txt",
    )
    cpu = run(request, Device.CPU)
    tpu = run(request, Device.TPU)
    assert called.get("checkpoint"), "pair did not route to checkpoint"
    assert cpu.score == tpu.score
    assert response_tuple(cpu) == response_tuple(tpu)
