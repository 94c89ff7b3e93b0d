"""Tier-3 oracle-vs-TPU equivalence (mirrors tests.cu:370-460).

The native CPU oracle plays the reference CPU engine's role; the TPU
row-scan engine must produce identical scores, aligned strings and
start offsets.
"""

import numpy as np
import pytest

from seqalign_tpu.constants import AlignmentType, Device, SequenceType

from .helpers import (
    random_dna,
    random_protein,
    request_from_argv,
    request_from_strings,
    response_tuple,
    run,
)


def assert_equivalent(request):
    cpu = run(request, Device.CPU)
    tpu = run(request, Device.TPU)
    assert response_tuple(cpu) == response_tuple(tpu)
    return cpu


def test_global_protein_01():
    request = request_from_argv(
        "--protein", "--gap-penalty", "11", "--global",
        "data/protein/P10635.fasta", "data/protein/P02232.fasta",
    )
    assert_equivalent(request)


def test_global_protein_self():
    request = request_from_argv(
        "--protein", "--gap-penalty", "5", "--global",
        "data/protein/P27895.fasta", "data/protein/P27895.fasta",
    )
    assert_equivalent(request)


def test_local_dna_01():
    request = request_from_argv(
        "--gap-penalty", "5", "--local",
        "data/dna/GCA_003231495.txt", "data/dna/dna_01.txt",
    )
    assert_equivalent(request)


def test_local_protein_01():
    request = request_from_argv(
        "--protein", "--gap-penalty", "5", "--local",
        "data/protein/P33450.fasta", "data/protein/P07327.fasta",
    )
    assert_equivalent(request)


@pytest.mark.parametrize("alignment_type", [AlignmentType.GLOBAL, AlignmentType.LOCAL])
@pytest.mark.parametrize("gap_penalty", [0, 1, 5, 11])
def test_fuzz_dna(alignment_type, gap_penalty):
    rng = np.random.default_rng(hash((str(alignment_type), gap_penalty)) % 2**31)
    for _ in range(4):
        n = int(rng.integers(1, 300))
        m = int(rng.integers(1, 300))
        text, pattern = random_dna(rng, max(n, m)), random_dna(rng, min(n, m))
        request = request_from_strings(
            text, pattern, alignment_type=alignment_type, gap_penalty=gap_penalty
        )
        assert_equivalent(request)


@pytest.mark.parametrize("alignment_type", [AlignmentType.GLOBAL, AlignmentType.LOCAL])
def test_fuzz_protein(alignment_type):
    rng = np.random.default_rng(7)
    for _ in range(4):
        n = int(rng.integers(1, 250))
        m = int(rng.integers(1, 250))
        text = random_protein(rng, max(n, m))
        pattern = random_protein(rng, min(n, m))
        request = request_from_strings(
            text,
            pattern,
            sequence_type=SequenceType.PROTEIN,
            alignment_type=alignment_type,
            gap_penalty=7,
        )
        assert_equivalent(request)


def test_tiny_edge_cases():
    # 1x1 and single-letter-vs-many shapes.
    for text, pattern in [("A", "A"), ("A", "T"), ("ATCGATCG", "A")]:
        for alignment_type in [AlignmentType.GLOBAL, AlignmentType.LOCAL]:
            request = request_from_strings(
                text, pattern, alignment_type=alignment_type
            )
            assert_equivalent(request)
