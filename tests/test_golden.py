"""Tier-2 golden-value tests against the oracle engine.

Expected scores/alignments are the reference suite's hard-coded values
(tests.cu:116-368); they are properties of algorithm + data and carry
over unchanged.
"""

import pytest

from seqalign_tpu import constants
from seqalign_tpu.constants import AlignmentType, Device, SequenceType

from .helpers import request_from_argv, request_from_strings, run

DNA_04_TEXT = (
    "CATAAAACTCTCGGTCGGGCTTAGTACCAGGACCGGCGCACCAGAGTGTCAATCACGACCCTTCACACTTTGTGC"
)
DNA_04_PATTERN = (
    "ATGAAGTTGTTCGCCTTACTTTTAATTCTACTCTCTCCTCGAGATTCGTCCGCTGAAAAATCTCTCAGCG"
)
DNA_04_ALIGNED_TEXT = (
    "CATAAAACTCTCGGTCGGGCTTAGTACCAGGAC--CGGCGCACCA-GAG-TGTCAATCACGACCCTTCACACTTTGT--GC-"
)
DNA_04_ALIGNED_PATTERN = (
    "-ATGAAG-T-T-GTTCGC-CTTACTTTTAATTCTACT-CTCTCCTCGAGAT-TCG-TC-CG-C--TGAAAAATCTCTCAGCG"
)

PROTEIN_01_TEXT = (
    "MVLSPADKTNVKAAWGKVGAHAGEYGAEALERMFLSFPTTKTYFPHFDLSHGSAQVKGHGKKVADALTNAVAHVDD"
    "MPNALSALSDLHAHKLRVDPVNFKLLSHCLLVTLAAHLPAEFTPAVHASLDKFLASVSTVLTSKYR"
)
PROTEIN_01_PATTERN = (
    "MVLSGEDKSNIKAAWGKIGGHGAEYGAEALERMFASFPTTKTYFPHFDVSHGSAQVKGHGKKVADALASAAGHLDD"
    "LPGALSALSDLHAHKLRVDPVNFKLLSHCLLVTLASHHPADFTPAVHASLDKFLASVSTVLTSKYR"
)

DEVICES = [Device.CPU, Device.TPU]


@pytest.mark.parametrize("device", DEVICES)
class TestGlobalGolden:
    def test_dna_01(self, device):
        # tests.cu:119-133
        request = request_from_argv(
            "--gap-penalty", "5", "--global",
            "data/dna/dna_01.txt", "data/dna/dna_02.txt",
        )
        assert run(request, device).score == -4

    def test_dna_02(self, device):
        assert run(request_from_strings("GCCT", "GGTC"), device).score == -4

    def test_dna_03(self, device):
        assert run(request_from_strings("TTCGCCT", "CTCGGTC"), device).score == 2

    def test_dna_04_exact_alignment(self, device):
        response = run(request_from_strings(DNA_04_TEXT, DNA_04_PATTERN), device)
        assert response.score == 22
        assert response.aligned_text == DNA_04_ALIGNED_TEXT
        assert response.aligned_pattern == DNA_04_ALIGNED_PATTERN

    def test_protein_01_exact_alignment(self, device):
        response = run(
            request_from_strings(
                PROTEIN_01_TEXT,
                PROTEIN_01_PATTERN,
                sequence_type=SequenceType.PROTEIN,
            ),
            device,
        )
        assert response.score == 821
        assert response.aligned_text == PROTEIN_01_TEXT
        assert response.aligned_pattern == PROTEIN_01_PATTERN

    def test_protein_02(self, device):
        request = request_from_argv(
            "--protein", "--gap-penalty", "5", "--global",
            "data/protein/P02232.fasta", "data/protein/P03989.fasta",
        )
        assert run(request, device).score == -597

    def test_protein_03(self, device):
        request = request_from_argv(
            "--protein", "--cpu", "--gap-penalty", "5", "--global",
            "data/protein/P05013.fasta", "data/protein/P07327.fasta",
        )
        assert run(request, device).score == -423


@pytest.mark.parametrize("device", DEVICES)
class TestLocalGolden:
    def test_dna_01(self, device):
        # tests.cu:330-350
        request = request_from_argv(
            "--gap-penalty", "5", "--local",
            "data/dna/GCA_003231495.txt", "data/dna/dna_01.txt",
        )
        response = run(request, device)
        assert response.score == 20
        assert response.aligned_text == "ACAC"
        assert response.aligned_pattern == "ACAC"
        assert response.start_in_aligned_text == 248
        assert response.start_in_aligned_pattern == 0

    def test_protein_01(self, device):
        # tests.cu:352-366
        request = request_from_argv(
            "--protein", "--gap-penalty", "10", "--local",
            "data/protein/P08519.fasta", "data/protein/P10635.fasta",
        )
        response = run(request, device)
        assert response.score == 57
        assert response.start_in_aligned_text == 4203
        assert response.start_in_aligned_pattern == 94


@pytest.mark.parametrize("device", DEVICES)
def test_dna_05_large(device):
    # tests.cu:234-248 — NC_018874 vs GCA_003231495 global = -5991.
    request = request_from_argv(
        "--gap-penalty", "5", "--global",
        "data/dna/NC_018874.txt", "data/dna/GCA_003231495.txt",
    )
    assert run(request, device).score == -5991
