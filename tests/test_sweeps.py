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
